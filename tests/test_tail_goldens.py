"""Direct registry-vs-oracle goldens for _WINDOW_TAIL rotations.

The external correctness driver verifies only the first 50 registry
entries (COVERAGE.md §"Driver verification window"); every query rotated
past position 50 must keep direct pytest coverage.  These tests run the
ROTATED queries' own oracle comparison (same canon rules as
scripts/check_contract.py: order-insensitive rows, column-name sort,
9 dp float rounding) at sf0.001 — a true in-repo twin of the driver row
the query gave up."""

import decimal
import math
import os

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return None if math.isnan(v) else round(v, 9)
    if isinstance(v, decimal.Decimal):  # DuckDB decimal literals (e.g.
        return round(float(v), 9)       # affine grid coords) vs Spark doubles
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def _assert_oracle_match(spark, ddb, name):
    from gregor_spark.entry_queries import REGISTRY

    fn, sql = REGISTRY[name]
    sdf = fn(spark, SF)
    got = _canon([tuple(r) for r in sdf.collect()], sdf.columns)
    rel = ddb.sql(sql)
    want = _canon(rel.fetchall(), list(rel.columns))
    assert len(got) > 0, f"{name}: empty result"
    assert got == want, f"{name}: spark/oracle mismatch ({len(got)} vs {len(want)} rows)"


@pytest.mark.parametrize(
    "name",
    [
        "doc_tiles",       # rotated late r5 (admitted focal_stats)
        "frame_plan",      # rotated late r5 (admitted kde_grid)
        "cust_no_orders",  # rotated late r5 (admitted semdedup)
        "events_sessions", # rotated late r5 (admitted track_interp)
        "text_quality",    # rotated late r5 (admitted slope_horn)
        "near_dup_lsh",    # rotated late r5 (admitted track_contacts)
        "dedup_exact",     # rotated late r5 (admitted morans_i)
        "focal_stats",     # rotated late r5 (admitted hillshade)
        "kde_grid",        # rotated late r5 (admitted getis_ord)
        "track_stats",     # rotated late r5 (admitted od_matrix)
        "sample_stratified",  # rotated late r5 (admitted staypoints)
        "doc_pairs_geodesic",  # rotated late r5 (admitted dbscan)
        "bloom_semi",      # rotated late r5 (admitted pq_adc)
        "cms_counts",      # rotated late r5 (admitted theta_sets)
        "repetition_filter",  # rotated late r5 (admitted flow_d8)
        "pii_scrub",       # rotated late r5 (admitted watershed)
        "events_asof_dups",  # rotated late r5 (admitted geohash_docs)
        "tpch_q3ish",      # rotated late r5 (admitted st_dbscan)
        "resample_bilinear",  # rotated late r5 (admitted triangles)
        "track_contacts",  # rotated late r5 (admitted pagerank)
        "hll_distinct",    # rotated late r5 (admitted link_pred)
        "zone_metrics",    # rotated late r5 (admitted graph_summary)
        "contamination",   # rotated late r5 (admitted bfs_hops)
        "hillshade",       # rotated r6 (admitted kcore3)
        "coreness",        # born-tail r6 (graph-dependent round count)
        "getis_ord",       # rotated r6 (admitted flow_accum)
        "od_matrix",       # rotated r6 (admitted frechet_sim)
        "watershed",       # rotated r6 (admitted reproject_albers)
        "bfs_hops",        # rotated r6 (admitted dedup_substrings)
        "geohash_docs",    # rotated r6 (admitted zonal_extras)
        "link_pred",       # rotated r6 (admitted pack_blocks)
        "idw_grid",        # rotated r6 (admitted viewshed)
        "track_interp",    # rotated r6 (admitted sssp_km)
        "bpe_token_count",  # rotated r6 (admitted bpe_merges)
        "sample_weighted",  # rotated r6 (admitted sample_quota)
        "quantiles_hist",  # rotated r6 (admitted mad_outliers)
        "slope_horn",      # rotated r6 (admitted contours)
        "warp_mercator",   # rotated r6 (admitted polygonize)
        "st_dbscan",       # rotated r6 (admitted zonal_crosstab)
        "morans_i",        # rotated r6 (admitted dsir_weights)
        "theta_sets",      # rotated r6 (admitted dsir_select)
        "aspect",          # born-tail r6 (gdaldem-aspect completion)
        "focal_majority",  # born-tail r6 (modal filter)
        # cost_distance: promoted to the driver window r7 (displaced
        # frechet_sim, which is rows-only/no-oracle — its tail coverage is
        # the DP parity suite in test_trajectory.py, not a SQL golden)
        "reproject_lambert93",  # born-tail r7 (parametrized CRS registry)
        "image_near_dup",  # born-tail r7 (perceptual dHash near-dup)
        "terrain_metrics",  # born-tail r7 (gdaldem TPI/TRI/roughness)
        "bpe_bytes",       # born-tail r7 (byte-level BPE trainer)
        "seg_intersections",  # born-tail r7 (segment overlay crossings)
        "snap_points",     # born-tail r7 (snap-to-nearest-segment)
        "convex_hull",     # born-tail r7 (hull-of-hulls, definitional oracle)
        "hilbert_docs",    # born-tail r7 (Hilbert ranks, CTE-chain oracle)
        "audio_features",  # born-tail r7 (PCM16 acoustic features)
        "rasterize_lines",  # born-tail r7 (supercover rasterization)
        "simplify_vw",     # born-tail r7 (bounded VW simplification)
        "lpa_communities",  # born-tail r7 (fixed-round synchronous LPA)
        "zone_metrics_geodesic",  # born-tail r7 (spherical excess area)
    ],
)
def test_rotated_query_matches_oracle(spark, ddb, name):
    from gregor_spark.entry_queries import REGISTRY

    if name not in REGISTRY:
        pytest.skip(f"{name} not registered")
    _assert_oracle_match(spark, ddb, name)


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_oracle_series_caps_cover_corpus(ddb, sf):
    """The dedup_substrings/BPE/DSIR DuckDB oracles unroll per-doc token
    positions with constant series (generate_series(0,199) /
    range(1,256)).  Those caps are only valid while every fixture doc
    stays under them — a longer doc would make the oracle silently
    diverge from the engine and surface as a confusing false mismatch.
    Guard the invariant here (documents.parquet max is 99 tokens)."""
    p = f"/root/testdata/sf{sf}/documents.parquet"
    if not os.path.exists(p):
        pytest.skip(f"no fixture at sf{sf}")
    (mx,) = duckdb.sql(
        f"SELECT max(len(string_split(text, ' '))) FROM '{p}'"
    ).fetchone()
    assert mx <= 200, (
        f"sf{sf} corpus max token count {mx} exceeds the oracle series "
        "caps (generate_series(0,199)/range(1,256) in entry_queries) — "
        "raise the caps before trusting those oracle rows"
    )
