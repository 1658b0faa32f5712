"""gregor_spark.functions — the engine's column-function surface, in the
style of ``pyspark.sql.functions``: every entry takes/returns Columns and
stays JVM-side (whole-stage codegen; no Python in any of these).

    from gregor_spark import functions as GF
    df.withColumn("cell", GF.cell(F.col("lon"), F.col("lat"), 8, BOUNDS))

These wrap the column-expression builders used internally by the
operators (operators/spatial_join.py, operators/tiles.py) so users can
compose tile arithmetic in their own queries without touching the
operator layer.  Bit-identical twins of the numpy kernels in geo/cells.py
(asserted in tests/test_spatial_join.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..geo import cells as C
from ..operators.spatial_join import (
    cell_id_col,
    cell_tile_cols,
    neighbor_cells_col,
)

__all__ = [
    "cell",
    "cell_res",
    "cell_tile",
    "parent_cell",
    "neighbor_cells",
    "tile_x",
    "tile_y",
    "token_int",
    "word_shingles",
    "tokens",
]


def cell(
    x: Column,
    y: Column,
    res: int,
    bounds: tuple[float, float, float, float] = C.WORLD,
) -> Column:
    """Morton cell id at ``res`` for point columns (H3 latlng_to_cell
    analog) — the codegen twin of geo/cells.cell (delegates to the single
    expression builder the operators use, so they can never drift)."""
    return cell_id_col(x, y, res, bounds)


def cell_res(cell_id: Column) -> Column:
    """Resolution encoded in a cell id."""
    return F.shiftrightunsigned(cell_id, 56)


def cell_tile(cell_id: Column) -> Column:
    """struct<ix, iy> tile coordinates of a cell id — ONE expression for
    both axes (callers previously paid two scalar UDFs for this)."""
    ix, iy = cell_tile_cols(cell_id)
    return F.struct(ix.alias("ix"), iy.alias("iy"))


def tile_x(cell_id: Column) -> Column:
    return cell_tile_cols(cell_id)[0]


def tile_y(cell_id: Column) -> Column:
    return cell_tile_cols(cell_id)[1]


def parent_cell(cell_id: Column, res: int, parent_res: int) -> Column:
    """Coarsen a cell id (hierarchical prefix truncation)."""
    if parent_res > res:
        raise ValueError("parent_res must be <= res")
    morton = cell_id.bitwiseAND(F.lit((1 << 56) - 1))
    return F.lit(parent_res << 56).bitwiseOR(
        F.shiftrightunsigned(morton, 2 * (res - parent_res))
    )


def neighbor_cells(cell_id: Column, res: int) -> Column:
    """array<long> 3x3 Moore neighborhood, grid-clipped."""
    return neighbor_cells_col(cell_id, res)


def token_int(t: Column) -> Column:
    """Engine-neutral token→int hash (oracle-reproducible)."""
    from ..ops.text import _token_int

    return _token_int(t)


def tokens(text: Column) -> Column:
    from ..ops import text as TX

    return TX.tokens(text)


def word_shingles(text: Column, k: int = 3) -> Column:
    from ..ops import text as TX

    return TX.word_shingles(text, k)
