"""Differential coverage for the p >= 5 plane-scaling regime.

The shipped testdata tops out at 2000 embeddings (sf0.1), so every
checked-in parity run exercises scaled_plane_count at its floor p = 4
and the oracle's masked-bucket terms for bits 5..11 were verified only
by construction. This test synthesizes a >2048-vector corpus (forcing
p = 5), writes it as an embeddings.parquet the registry queries can
load, and runs the registered near-dup queries against their DuckDB
oracles — so the extra plane terms AND the oracle's j < np.p gating are
differentially covered, not just derived.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bigdatasmallprice_spark.operators.similarity import (
    NEARDUP_BLOCK,
    scaled_plane_count,
)
import duckdb

from bigdatasmallprice_spark.registry import all_queries
from tests.test_oracle_parity import canon

N_VECS = 2200  # ceil(2200/128) = 18 blocks -> smallest p with 2^p >= 18 is 5


def _write_corpus(tmpdir: str) -> str:
    rng = np.random.default_rng(424242)
    base = rng.uniform(-1.0, 1.0, size=(N_VECS, 64)).astype("float32")
    # plant guaranteed near-duplicates: every 40th vector is a lightly
    # perturbed copy of its predecessor (cosine >> 0.35), so the verify
    # stage has real pairs to agree on in both engines
    for i in range(40, N_VECS, 40):
        base[i] = (base[i - 1] + rng.normal(0, 0.05, 64).astype("float32")).astype(
            "float32"
        )
    tbl = pa.table(
        {
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.array(
                [list(map(float, row)) for row in base], pa.list_(pa.float32())
            ),
            "label": pa.array([i % 5 for i in range(N_VECS)], pa.int32()),
        }
    )
    pq.write_table(tbl, f"{tmpdir}/embeddings.parquet")
    return tmpdir


def test_scaled_plane_count_leaves_floor():
    assert scaled_plane_count(2000) == 4  # sf0.1 regime: still the floor
    assert scaled_plane_count(N_VECS) == 5
    assert scaled_plane_count(NEARDUP_BLOCK * (1 << 11) + 1) == 12


@pytest.mark.parametrize("name", ["embedding_neardup", "embedding_neardup_banded"])
def test_neardup_parity_at_p5(spark, tmp_path, name):
    sf_dir = _write_corpus(str(tmp_path))
    spec = all_queries()[name]
    sdf = spec.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    assert len(srows) > 0, f"{name}: planted near-dups not detected"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    res = con.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)}"
    assert canon(srows, scols) == canon(orows, ocols)
