"""BPE merge induction vs an independent greedy-scan reference AND the
unrolled-SQL oracle (same double-space replace encoding)."""

import re
from collections import Counter

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.tfidf import (_bpe_encode,
                                                         _bpe_symbols,
                                                         bpe_train)

pytestmark = pytest.mark.usefixtures("ray_session")


def naive_bpe(texts, k):
    """Independent reference: explicit symbol lists + greedy index scan."""
    wc = Counter()
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            wc[w] += 1
    words = {w: list(w) for w in wc}
    out = []
    for rank in range(k):
        pc = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, l, r, l + r, c))
        for w, syms in words.items():
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    ns.append(l + r)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            words[w] = ns
    return out


def _rows(tbl_out):
    return list(zip(tbl_out.column("rank").to_pylist(),
                    tbl_out.column("left").to_pylist(),
                    tbl_out.column("right").to_pylist(),
                    tbl_out.column("merged").to_pylist(),
                    tbl_out.column("pair_count").to_pylist()))


TEXTS = ["aaaa aaaa banana", "low lower lowest banana",
         "aaaa low low", "banana band bandana"]


class TestBpeTrain:
    def test_matches_naive_reference_with_runs(self):
        tbl = pa.table({"text": pa.array(TEXTS, pa.string())})
        out = bpe_train(ray.data.from_arrow(tbl).repartition(3), "text",
                        num_merges=10)
        assert _rows(out) == naive_bpe(TEXTS, 10)
        # the run word 'aaaa' must merge (a,a) then (aa,aa)
        merged = [m for _, _, _, m, _ in _rows(out)]
        assert "aa" in merged and "aaaa" in merged

    def test_layout_independent(self):
        tbl = pa.table({"text": pa.array(TEXTS * 5, pa.string())})
        a = bpe_train(ray.data.from_arrow(tbl).repartition(1), "text", 6)
        b = bpe_train(ray.data.from_arrow(tbl).repartition(7), "text", 6)
        assert a.equals(b)

    def test_early_stop_and_min_count(self):
        tbl = pa.table({"text": pa.array(["ab", "cd"], pa.string())})
        out = bpe_train(ray.data.from_arrow(tbl), "text", num_merges=10)
        # 2 possible merges, then every word is one symbol -> stop
        assert out.num_rows == 2
        out2 = bpe_train(ray.data.from_arrow(tbl), "text", num_merges=10,
                         min_count=2)
        assert out2.num_rows == 0  # each pair occurs once

    def test_double_space_encoding_run_semantics(self):
        # ' a  a ' replace on the encoding == greedy scan on symbols
        s = _bpe_encode("aaaa")
        assert _bpe_symbols(s) == ["a", "a", "a", "a"]
        t = s.replace(" a  a ", " aa ")
        assert _bpe_symbols(t) == ["aa", "aa"]

    def test_matches_unrolled_sql(self):
        import __ray_entry__ as entry

        tbl = pa.table({"text": pa.array(TEXTS, pa.string())})
        con = duckdb.connect()
        con.register("documents", tbl)
        want = con.execute(entry._bpe_oracle(8)).fetchall()
        out = bpe_train(ray.data.from_arrow(tbl).repartition(2), "text", 8)
        assert _rows(out) == [tuple(r) for r in want]


class TestBpeApply:
    def test_piece_counts_shrink_with_merges(self):
        from insurance_pdf_extractor_ray.pipelines.tfidf import (
            bpe_apply_token_counts, bpe_train)

        tbl = pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                        "text": pa.array(TEXTS, pa.string())})
        ds = ray.data.from_arrow(tbl).repartition(2)
        m0 = bpe_train(ds, "text", num_merges=0)
        m8 = bpe_train(ds, "text", num_merges=8)
        out0 = {r["doc_id"]: r for r in
                bpe_apply_token_counts(ds, "text", "doc_id", m0).take_all()}
        out8 = {r["doc_id"]: r for r in
                bpe_apply_token_counts(ds, "text", "doc_id", m8).take_all()}
        for d in out0:
            # zero merges: pieces == characters of the tokens
            assert out0[d]["n_pieces"] >= out8[d]["n_pieces"]
            assert out0[d]["n_tokens"] == out8[d]["n_tokens"]
        # 'aaaa aaaa banana' = 16 chars of tokens; after merges far fewer
        assert out0[0]["n_pieces"] == 14
        assert out8[0]["n_pieces"] <= 6

    def test_matches_apply_oracle(self):
        import __ray_entry__ as entry
        from insurance_pdf_extractor_ray.pipelines.tfidf import (
            bpe_apply_token_counts, bpe_train)

        tbl = pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                        "text": pa.array(TEXTS, pa.string())})
        con = duckdb.connect()
        con.register("documents", tbl)
        want = con.execute(entry._bpe_oracle(8, mode="apply")).fetchall()
        ds = ray.data.from_arrow(tbl).repartition(3)
        out = bpe_apply_token_counts(
            ds, "text", "doc_id", bpe_train(ds, "text", 8)).take_all()
        out.sort(key=lambda r: r["doc_id"])
        got = [(r["doc_id"], r["n_tokens"], r["n_pieces"]) for r in out]
        assert got == [tuple(r) for r in want]
