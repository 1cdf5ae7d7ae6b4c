"""Direct unit tests for the Arrow vector kernels (functions/vectors.py):
fold-order parity with the HOF/SQL definition, tie-break determinism, and
a larger-than-testdata IVF probe for bucket balance.

The kernels are exercised through plain pandas/numpy calls (no Spark) so
failures localize to the math, not the plan.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from dbsurveyor_spark.functions.vectors import cell_topk_mapper

def _fold_cosine(a, b):
    """The contract: ((0.0 + a1·b1) + a2·b2) + … left fold, guard, divide."""
    d = na = nb = 0.0
    for x, y in zip(a, b):
        d = d + x * y
        na = na + x * x
        nb = nb + y * y
    na, nb = math.sqrt(na), math.sqrt(nb)
    return d / (na * nb) if na > 0 and nb > 0 else 0.0

def _run_mapper(cent_rows, nprobe, vec_ids, vectors):
    pdf = pd.DataFrame(
        {"vec_id": vec_ids, "embedding": [np.asarray(v) for v in vectors]}
    )
    out = list(cell_topk_mapper(cent_rows, nprobe)([pdf]))
    return pd.concat(out) if out else pd.DataFrame()

class TestCellTopkMapper:
    def test_matches_scalar_fold_ranking(self):
        rng = np.random.default_rng(7)
        dim, k, m = 16, 5, 40
        cents = [(i + 1, list(rng.normal(size=dim))) for i in range(k)]
        vecs = [list(rng.normal(size=dim)) for _ in range(m)]
        got = _run_mapper(cents, 2, list(range(m)), vecs)
        for vid in range(m):
            scored = sorted(
                ((-_fold_cosine(vecs[vid], c), cid) for cid, c in cents)
            )
            expect = [cid for _, cid in scored[:2]]
            mine = got[got.vec_id == vid].sort_values("rn")["cell_id"].tolist()
            assert mine == expect, f"vec {vid}"

    def test_tie_breaks_by_ascending_cell_id(self):
        # identical centroids → all cosines equal → rn order must be cell_id
        cents = [(3, [1.0, 0.0]), (7, [1.0, 0.0]), (9, [1.0, 0.0])]
        got = _run_mapper(cents, 3, [0], [[2.0, 0.0]])
        assert got.sort_values("rn")["cell_id"].tolist() == [3, 7, 9]

    def test_zero_norm_vector_scores_zero_everywhere(self):
        cents = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
        got = _run_mapper(cents, 1, [0], [[0.0, 0.0]])
        # all scores 0.0 → tie → smallest cell_id wins
        assert got["cell_id"].tolist() == [1]

    def test_nprobe_clamped_to_cell_count(self):
        cents = [(1, [1.0]), (2, [0.5])]
        got = _run_mapper(cents, 10, [0, 1], [[1.0], [2.0]])
        assert len(got) == 4  # 2 vectors × min(10, 2) cells
        assert got["rn"].max() == 2

    def test_float32_input_promotes_exactly(self):
        cents = [(1, [0.25, 0.5]), (2, [-0.25, 0.125])]
        v32 = np.array([0.25, 0.5], dtype=np.float32)
        got = _run_mapper(cents, 1, [0], [v32])
        assert got["cell_id"].tolist() == [1]

class TestScaleProbe:
    def test_ivf_buckets_stay_balanced_at_50k(self):
        """50k gaussian vectors, √n≈223 cells: the kernel must keep cells
        balanced enough that no in-cell pair join goes quadratic — the
        property that makes IVF-bucketed dedup survive a 100× scale-up.
        Seeds are the first k vectors (stand-in for the md5 sample)."""
        rng = np.random.default_rng(42)
        n, dim = 50_000, 32
        k = int(math.floor(math.sqrt(n)))
        V = rng.normal(size=(n, dim))
        cents = [(i + 1, list(V[i])) for i in range(k)]
        got = _run_mapper(cents, 1, list(range(n)), list(V))
        occupancy = got.groupby("cell_id").size()
        assert occupancy.sum() == n
        mean = n / k
        # gaussian data + data-point seeds: heaviest cell stays within a
        # small multiple of the mean (quadratic blowup would be ~n/k × k)
        assert occupancy.max() < 25 * mean, occupancy.max()
        assert len(occupancy) > k * 0.5  # most cells actually used


class TestCentroidPartialMapper:
    """The fused Lloyd map-side aggregator: assignment must equal
    cell_topk_mapper(nprobe=1); unit sums must replay the decimal(30,9)
    cast EXACTLY as Spark (shortest-repr + HALF_UP) and DuckDB do."""

    @staticmethod
    def _partials(cents, vectors, chunks=1):
        from dbsurveyor_spark.functions.vectors import centroid_partial_mapper

        batches = [
            pd.DataFrame({"embedding": [np.asarray(v) for v in part]})
            for part in np.array_split(np.asarray(vectors, dtype=float), chunks)
            if len(part)
        ]
        return list(centroid_partial_mapper(cents)(batches))

    @staticmethod
    def _spark_units(v):
        from decimal import ROUND_HALF_UP, Decimal

        return int(
            Decimal(repr(float(v)))
            .quantize(Decimal(1).scaleb(-9), rounding=ROUND_HALF_UP)
            .scaleb(9)
        )

    def test_matches_scalar_reference(self):
        rng = np.random.default_rng(11)
        dim, k, m = 8, 4, 60
        cents = [(i + 1, list(rng.normal(size=dim))) for i in range(k)]
        vecs = [list(rng.normal(size=dim)) for _ in range(m)]
        out = pd.concat(self._partials(cents, vecs, chunks=3))
        merged = {}
        for _, r in out.iterrows():
            cnt, sums = merged.get(r["cell_id"], (0, [0] * dim))
            merged[r["cell_id"]] = (
                cnt + int(r["cnt"]),
                [a + b for a, b in zip(sums, r["sums"])],
            )
        # scalar reference: assign by fold cosine, sum exact units
        expect = {}
        for v in vecs:
            best = min(
                ((-_fold_cosine(v, c), cid) for cid, c in cents)
            )[1]
            cnt, sums = expect.get(best, (0, [0] * dim))
            expect[best] = (
                cnt + 1,
                [a + self._spark_units(x) for a, x in zip(sums, v)],
            )
        assert merged == expect

    def test_partition_invariance(self):
        rng = np.random.default_rng(13)
        cents = [(i + 1, list(rng.normal(size=6))) for i in range(3)]
        vecs = [list(rng.normal(size=6)) for _ in range(50)]
        from dbsurveyor_spark.functions.vectors import merge_centroid_partials

        def rows(chunks):
            out = pd.concat(self._partials(cents, vecs, chunks=chunks))
            return [r for _, r in out.iterrows()]

        assert merge_centroid_partials(rows(1)) == merge_centroid_partials(
            rows(7)
        )

    def test_boundary_values_replay_decimal_cast(self):
        # values engineered near the 1e-9 rounding boundary must take the
        # exact Decimal path and match the shortest-repr HALF_UP cast
        vals = [5e-10, -5e-10, 1.5e-9, 2.4999999995e-9, 0.1234567895,
                -0.9999999995, 0.49999999999999994e-9, 1.0000000005]
        dim = len(vals)
        cents = [(1, [1.0] * dim)]
        out = pd.concat(self._partials(cents, [vals]))
        got = out.iloc[0]["sums"]
        expect = [self._spark_units(v) for v in vals]
        assert list(got) == expect

    def test_spark_and_duckdb_agree_with_kernel(self, spark, duck):
        from pyspark.sql import functions as F

        # the kernel's unit lattice == Spark cast(decimal(30,9)) == DuckDB
        # cast, on random and boundary-ish values
        rng = np.random.default_rng(17)
        vals = [float(x) for x in rng.normal(size=200)] + [
            5e-10, -5e-10, 0.1234567895, -2.5e-9
        ]
        kernel = [self._spark_units(v) for v in vals]
        sdf = spark.createDataFrame([(v,) for v in vals], "v double")
        got_spark = [
            r["u"]
            for r in sdf.select(
                F.round(
                    F.col("v").cast("decimal(30,9)") * 1000000000
                ).cast("long").alias("u")
            ).collect()
        ]
        got_duck = [
            r[0]
            for r in duck.execute(
                "SELECT CAST(round(CAST(v AS DECIMAL(30,9)) * 1000000000) AS BIGINT)"
                " FROM (SELECT unnest(?) AS v)", [vals]
            ).fetchall()
        ]
        assert kernel == got_spark == got_duck
