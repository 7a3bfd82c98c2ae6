"""Incremental MinHash dedup against the at-rest bucketed LSH index."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.minhashindex import (
    minhash_dedup_incremental,
    minhash_index_append,
)

pytestmark = pytest.mark.usefixtures("ray_session")

WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
         "kilo lima").split()


def _base_text(rng):
    return " ".join(WORDS[rng.randint(0, len(WORDS))] for _ in range(60))


def _perturb(text, at):
    toks = text.split()
    toks[at] = "zulu"
    return " ".join(toks)


def _tbl(ids, texts):
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _run_increment(tbl, index_dir, tmp_path, tag):
    kept, sig_rows = minhash_dedup_incremental(
        ray.data.from_arrow(tbl).repartition(2), str(index_dir),
        "text", "doc_id", threshold=0.7,
        n_buckets=8, tmp_dir=str(tmp_path / f"tmp_{tag}"))
    kept_ids = sorted(r["doc_id"] for r in kept.take_all())
    return kept_ids, sig_rows


def test_cross_increment_and_in_batch(tmp_path):
    rng = np.random.RandomState(11)
    bases = [_base_text(rng) for _ in range(4)]
    index_dir = tmp_path / "idx"

    # increment 1: four distinct docs — all kept, index created
    k1, s1 = _run_increment(_tbl([0, 1, 2, 3], bases), index_dir,
                            tmp_path, "a")
    assert k1 == [0, 1, 2, 3]
    minhash_index_append(str(index_dir), s1, "doc_id", n_buckets=8)

    # increment 2: near-dup of doc 0 (drop), fresh doc (keep), and an
    # in-batch near-dup pair (keep min id only)
    rng2 = np.random.RandomState(12)
    fresh = _base_text(rng2)
    inc2 = _tbl([10, 11, 12, 13],
                [_perturb(bases[0], 5), fresh, fresh + " omega",
                 _perturb(bases[2], 30)])
    k2, s2 = _run_increment(inc2, index_dir, tmp_path, "b")
    assert 10 not in k2          # near-dup of indexed doc 0
    assert 13 not in k2          # near-dup of indexed doc 2
    assert 11 in k2              # fresh doc kept
    # 12 is a near-dup of 11 (same increment): exactly one of them kept,
    # and keep-first means the min id wins
    assert 12 not in k2
    minhash_index_append(str(index_dir), s2, "doc_id", n_buckets=8)

    # increment 3: near-dup of the INCREMENT-2 kept doc is now caught too
    k3, _ = _run_increment(_tbl([20, 21], [_perturb(fresh, 10),
                                           _base_text(np.random.RandomState(99))]),
                           index_dir, tmp_path, "c")
    assert k3 == [21]


def test_first_increment_no_index_is_pure_in_batch(tmp_path):
    rng = np.random.RandomState(5)
    base = _base_text(rng)
    tbl = _tbl([0, 1, 2], [base, _perturb(base, 3), _base_text(rng)])
    kept, _ = _run_increment(tbl, tmp_path / "idx0", tmp_path, "solo")
    assert kept == [0, 2]


def test_zero_candidate_probe_keeps_everything(tmp_path):
    rng = np.random.RandomState(21)
    index_dir = tmp_path / "idx1"
    k1, s1 = _run_increment(_tbl([0], [_base_text(rng)]), index_dir,
                            tmp_path, "x")
    minhash_index_append(str(index_dir), s1, "doc_id", n_buckets=8)
    # an increment with nothing remotely similar: all kept
    other = " ".join(f"w{i}" for i in range(80))
    k2, _ = _run_increment(_tbl([5, 6], [other, other.upper()]), index_dir,
                           tmp_path, "y")
    assert 5 in k2


def test_matches_batch_path_on_disjoint_dup_groups(tmp_path):
    """On a corpus with no cross-group chains, two increments == one batch
    run of minhash_dedup (keep-first by id, increments ordered by id)."""
    from insurance_pdf_extractor_ray.pipelines.dedup import minhash_dedup

    rng = np.random.RandomState(7)
    ids, texts = [], []
    k = 0
    for b in range(6):
        base = _base_text(rng)
        for copy in range(3):
            texts.append(_perturb(base, copy * 5) if copy else base)
            ids.append(k)
            k += 1
    tbl = _tbl(ids, texts)

    batch_kept = sorted(
        r["doc_id"] for r in minhash_dedup(
            ray.data.from_arrow(tbl), "text", "doc_id",
            threshold=0.7).take_all())

    index_dir = tmp_path / "idx2"
    half = tbl.slice(0, 9)
    rest = tbl.slice(9)
    k1, s1 = _run_increment(half, index_dir, tmp_path, "h1")
    minhash_index_append(str(index_dir), s1, "doc_id", n_buckets=8)
    k2, _ = _run_increment(rest, index_dir, tmp_path, "h2")
    assert sorted(k1 + k2) == batch_kept


def test_compact_and_stop_bands(tmp_path):
    from insurance_pdf_extractor_ray.pipelines.minhashindex import (
        band_stats,
        compact_bucketed,
        write_stop_bands,
    )

    rng = np.random.RandomState(31)
    index_dir = tmp_path / "idx3"
    # three appends -> multiple fragments per bucket
    boiler = " ".join(WORDS) * 5  # identical text in every increment
    for i in range(3):
        tbl = _tbl([100 * i, 100 * i + 1],
                   [_base_text(rng), boiler])
        kept, sigs = minhash_dedup_incremental(
            ray.data.from_arrow(tbl), str(index_dir), "text", "doc_id",
            threshold=1.01,  # est <= 1.0: nothing drops, boilerplate piles up
            n_buckets=4, tmp_dir=str(tmp_path / f"t{i}"))
        minhash_index_append(str(index_dir), sigs, "doc_id", n_buckets=4)

    stats = band_stats(str(index_dir), top=5)
    assert stats.num_rows > 0
    assert stats.column("n").to_pylist() == sorted(
        stats.column("n").to_pylist(), reverse=True)

    n_compacted = compact_bucketed(str(index_dir / "bands"))
    assert n_compacted > 0
    import glob as g
    for d in g.glob(str(index_dir / "bands" / "_bucket=*")):
        assert len(g.glob(d + "/*.parquet")) == 1

    # identical boilerplate in 3 increments -> its bands hold >2 rows each
    n_stopped = write_stop_bands(str(index_dir), max_band_rows=2)
    assert n_stopped > 0
    # a 4th increment of pure boilerplate: every band frozen -> kept,
    # unindexed, and crucially no candidate explosion
    kept, sigs = minhash_dedup_incremental(
        ray.data.from_arrow(_tbl([900], [boiler])), str(index_dir),
        "text", "doc_id", threshold=0.5, n_buckets=4,
        tmp_dir=str(tmp_path / "t9"))
    assert [r["doc_id"] for r in kept.take_all()] == [900]
    assert sigs.count() == 0  # all its band rows were stop-filtered


def test_repeated_id_rows_never_self_dup(tmp_path):
    """A doc whose shrunk sig rows straddled a batch boundary keeps TWO
    keeper signatures; the sig join then emits its band row once per
    keeper, so a collide group can carry the same id twice.  The chain
    kernel must skip the repeat — before the fix the doc estimated
    Jaccard 1.0 against itself and was dropped as its own duplicate."""
    from insurance_pdf_extractor_ray.pipelines.bucketed import write_bucketed
    from insurance_pdf_extractor_ray.pipelines.dedup import _bucket_dups
    from insurance_pdf_extractor_ray.pipelines.minhashindex import (
        _local_band_dups,
    )

    sig_a = np.arange(128, dtype=np.uint64).tobytes()
    sig_b = (np.arange(128, dtype=np.uint64) + 500).tobytes()  # est 0 vs a

    # kernel level: repeat of id 5 skipped; true near-dup 6 still found
    g = pa.table({"doc_id": pa.array([5, 5, 9, 6], pa.int64()),
                  "sig": pa.array([sig_a, sig_a, sig_b, sig_a], pa.binary())})
    assert _bucket_dups(g, "doc_id", 0.8).column("doc_id").to_pylist() == [6]
    g2 = pa.table({"doc_id": pa.array([5, 5], pa.int64()),
                   "sig": pa.array([sig_a, sig_a], pa.binary())})
    assert _bucket_dups(g2, "doc_id", 0.8).num_rows == 0

    # layout level: the same rows through the per-bucket run-split path
    layout = str(tmp_path / "collide_by_band")
    rows = pa.table({
        "band_key": pa.array([7, 7, 7, 7, 3, 3], pa.uint64()),
        "doc_id": pa.array([5, 5, 9, 6, 2, 2], pa.int64()),
        "sig": pa.array([sig_a, sig_a, sig_b, sig_a, sig_b, sig_b],
                        pa.binary()),
    })
    write_bucketed(ray.data.from_arrow(rows), layout, "band_key", 4)
    dups = sorted(r["doc_id"] for r in _local_band_dups(
        layout, "doc_id", pa.int64(), 0.8, 2048).take_all())
    assert dups == [6]
