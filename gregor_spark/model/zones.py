"""ZoneSet — the engine's polygon-layer container.

The reference keeps polygons in a GeoDataFrame with the index as the join
key (disaggregate.py:36-38, aggregate.py:136-139); here zones carry an
explicit ``zone_id`` column/field.  Zone layers (administrative
boundaries, segmentations) are small relative to the fact side at any
scale — thousands to millions of vertices — so the engine keeps a
driver-side numpy representation that ships to executors inside pandas-UDF
closures (one Arrow-serialized broadcast per stage), plus a DataFrame form
(``to_df`` / ``cover_df``) for the partitioned join path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..geo import cells as C
from ..geo import kernels as K


@dataclass
class ZoneSet:
    zone_ids: np.ndarray  # int64
    xs: list[np.ndarray]  # exterior ring x per zone
    ys: list[np.ndarray]
    values: dict[int, float] = field(default_factory=dict)  # optional zone values

    def __post_init__(self) -> None:
        self.zone_ids = np.asarray(self.zone_ids, dtype=np.int64)
        self.xs = [np.asarray(a, dtype=np.float64) for a in self.xs]
        self.ys = [np.asarray(a, dtype=np.float64) for a in self.ys]

    # -------------------------------------------------- constructors

    @classmethod
    def from_fixture(cls, zones, values: dict[int, float] | None = None) -> "ZoneSet":
        """From model.fixtures Zone dataclasses."""
        return cls(
            np.array([z.zone_id for z in zones], dtype=np.int64),
            [np.asarray(z.xs, dtype=np.float64) for z in zones],
            [np.asarray(z.ys, dtype=np.float64) for z in zones],
            dict(values or {}),
        )

    @classmethod
    def from_bboxes(
        cls, rows: list[tuple[int, float, float, float, float]]
    ) -> "ZoneSet":
        """rows: (zone_id, minx, miny, maxx, maxy) — CCW box rings."""
        ids, xs, ys = [], [], []
        for zid, minx, miny, maxx, maxy in rows:
            ids.append(zid)
            xs.append(np.array([minx, maxx, maxx, minx]))
            ys.append(np.array([miny, miny, maxy, maxy]))
        return cls(np.asarray(ids, dtype=np.int64), xs, ys)

    # -------------------------------------------------- geometry views

    def __len__(self) -> int:
        return len(self.zone_ids)

    def arrays(self):
        return self.zone_ids, self.xs, self.ys

    def total_bounds(self) -> tuple[float, float, float, float]:
        """Union bbox (reference GeoSeries.total_bounds, disaggregate.py:93)."""
        bb = np.array([K.polygon_bbox(x, y) for x, y in zip(self.xs, self.ys)])
        return (
            float(bb[:, 0].min()),
            float(bb[:, 1].min()),
            float(bb[:, 2].max()),
            float(bb[:, 3].max()),
        )

    def geometry_lookup(self) -> dict[int, tuple[np.ndarray, np.ndarray]]:
        return {
            int(z): (x, y) for z, x, y in zip(self.zone_ids, self.xs, self.ys)
        }

    # -------------------------------------------------- DataFrame forms

    def to_df(self, spark):
        """DataFrame(zone_id, xs array<double>, ys array<double>, value)."""
        rows = [
            (
                int(z),
                [float(v) for v in x],
                [float(v) for v in y],
                float(self.values.get(int(z), float("nan"))),
            )
            for z, x, y in zip(self.zone_ids, self.xs, self.ys)
        ]
        return spark.createDataFrame(
            rows, "zone_id long, xs array<double>, ys array<double>, value double"
        )

    def values_df(self, spark, column: str = "value"):
        from .localdf import local_df

        rows = [(int(z), float(v)) for z, v in self.values.items()]
        return local_df(spark, rows, f"zone_id long, {column} double")

    def values_df_ids(self, spark):
        """Just the zone ids (for left joins that keep empty zones)."""
        from .localdf import local_df

        return local_df(
            spark, [(int(z),) for z in self.zone_ids], "zone_id long"
        )

    def cover(
        self, res: int, bounds: tuple[float, float, float, float] = C.WORLD
    ) -> list[tuple[int, int, bool]]:
        """(zone_id, cell_id, full) candidate-cover triples at resolution
        ``res``; ``full`` cells are strictly interior (facts there skip the
        exact PIP refine — see geo/cells.polyfill)."""
        out = []
        for z, x, y in zip(self.zone_ids, self.xs, self.ys):
            cells, full = C.polyfill(x, y, res, bounds, classify=True)
            for cid, f in zip(cells, full):
                out.append((int(z), int(cid), bool(f)))
        return out

    def cover_df(
        self, spark, res: int, bounds: tuple[float, float, float, float] = C.WORLD
    ):
        from .localdf import local_df

        return local_df(
            spark, self.cover(res, bounds), "zone_id long, cell_id long, _full boolean"
        )
