"""Focused tests for the round-11 dedup_embedding_cosine replan.

The verify was reshaped from replicate-all-x-slice cogroup + dense
rounding over the full score matrix to a group-pair cogroup (g = vec_id
mod G; task (g1 <= g2) scores the g1-block x g2-block cross) with a
prefilter-then-exact-score survivor path. These tests pin the two
properties the replan must preserve:

1. PAIR COVERAGE: every same-label (vec_a < vec_b) pair is scored
   exactly once — no pair lost between diagonal/off-diagonal tasks, no
   pair duplicated, and off-diagonal tasks emit the canonical
   (min id, max id) orientation even when the smaller id lands on the
   b side.
2. PREFILTER EXACTNESS: pairs near the 0.99 verdict line survive the
   D >= (t*|a|)*|b| prefilter iff their exactly-recomputed rounded
   cosine passes — the fixture is a brute-force float64 recomputation
   of the same corpus with the same half-away-from-zero rounding.

The fixture writes a synthetic embeddings.parquet (the only table the
operator reads) with vectors spanning all mod-G groups, both id orders
across groups, near-threshold cosines on both sides of 0.99, and ids
divisible by 10 so the operator's scaled-copy branch (cos == 1.0)
participates.
"""
from __future__ import annotations

import math

import numpy as np
import pytest

from kuibadb_spark.operators.dedup import dedup_embedding_cosine

DIM = 8
N_BASE = 41  # spans all mod-8 groups several times; includes %10 == 0 ids


def _mk_vectors() -> list[tuple[int, list[float], int]]:
    """Deterministic corpus: label-0 rows form a tight cluster (many
    pairs with cos in [0.985, 1.0], straddling the verdict line), other
    labels are isotropic noise (no qualifying pairs expected, exercises
    empty groups)."""
    rng = np.random.default_rng(7)
    rows = []
    base = rng.normal(size=DIM)
    base /= np.linalg.norm(base)
    for vid in range(N_BASE):
        label = vid % 3
        if label == 0:
            # perturbation sweep: eps from tiny (cos ~ 1) to large
            # (cos ~ 0.97) so pairs land on both sides of 0.99
            eps = 0.005 + 0.075 * ((vid % 13) / 13.0)
            v = base + eps * rng.normal(size=DIM)
        else:
            v = rng.normal(size=DIM)
        rows.append((vid, [float(np.float32(x)) for x in v], label))
    return rows


def _expected(rows):
    """Brute force, replicating the operator's declared math: corpus =
    rows + x2-scaled copies of vec_id % 10 == 0; float64 over the
    float32-stored components; keep same-label vec_a < vec_b pairs with
    half-away-from-zero-rounded cosine >= 0.99."""
    corpus = list(rows) + [
        (vid + 1000000, [x * 2.0 for x in v], label)
        for vid, v, label in rows
        if vid % 10 == 0
    ]
    out = {}
    for i in range(len(corpus)):
        for j in range(len(corpus)):
            ia, va, la = corpus[i]
            ib, vb, lb = corpus[j]
            if la != lb or ia >= ib:
                continue
            dot = sum(x * y for x, y in zip(va, vb))
            na = math.sqrt(sum(x * x for x in va))
            nb = math.sqrt(sum(x * x for x in vb))
            raw = dot / (na * nb)
            cos = math.copysign(
                math.floor(abs(raw) * 1e6 + 0.5) / 1e6, raw
            )
            if cos >= 0.99:
                out[(ia, ib)] = cos
    return out


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("emb_fixture")
    rows = _mk_vectors()
    df = spark.createDataFrame(
        [(vid, [float(np.float32(x)) for x in v], label)
         for vid, v, label in rows],
        "vec_id bigint, embedding array<float>, label int",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(d / "embeddings.parquet")
    )
    return str(d), rows


def test_pair_coverage_and_orientation(spark, fixture_dir):
    d, rows = fixture_dir
    got = {
        (r.vec_a, r.vec_b): r.cos
        for r in dedup_embedding_cosine(spark, d).collect()
    }
    exp = _expected(rows)
    # any missed pair = coverage hole (e.g. a lost off-diagonal task);
    # any extra = a duplicated or mis-oriented emission
    assert set(got) == set(exp), (
        f"missing={sorted(set(exp) - set(got))[:5]} "
        f"extra={sorted(set(got) - set(exp))[:5]}"
    )
    # emitted values are the exact recomputation, not the prefilter bound
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=0), (k, got[k], exp[k])
    # sanity: the fixture actually exercises the interesting shapes
    assert any(a % 8 != b % 8 for a, b in exp), "no cross-group pair"
    assert any(a % 8 == b % 8 for a, b in exp), "no diagonal pair"
    assert any(b >= 1000000 for _, b in exp), "no scaled-copy pair"
    assert any(c == 1.0 for c in exp.values()), "no cos==1 pair"


def test_near_threshold_band(spark, fixture_dir):
    """The brute-force set must contain pairs close to the verdict line
    on BOTH sides (otherwise the prefilter is untested), and the
    operator must agree pair-by-pair in that band."""
    d, rows = fixture_dir
    exp = _expected(rows)
    corpus = {vid: (v, label) for vid, v, label in rows}
    near_reject = 0
    for ia, (va, la) in corpus.items():
        for ib, (vb, lb) in corpus.items():
            if la != lb or ia >= ib:
                continue
            dot = sum(x * y for x, y in zip(va, vb))
            na = math.sqrt(sum(x * x for x in va))
            nb = math.sqrt(sum(x * x for x in vb))
            raw = dot / (na * nb)
            if 0.97 <= raw < 0.9899:
                near_reject += 1
                assert (ia, ib) not in exp
    assert near_reject > 0, "fixture has no near-line rejected pairs"
    kept_near = [c for c in exp.values() if c < 0.995]
    assert kept_near, "fixture has no near-line kept pairs"
