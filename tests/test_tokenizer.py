"""Trained-BPE tokenizer: serial semantics, distributed apply parity,
and the pack/chunk seam (round-5; upstream inxs has no tokenizer — this
is the training-pipeline half of the brief)."""

import pytest

from pyspark.sql import functions as F


class TestSerialBpe:
    def test_classic_merge_learning(self):
        """The Sennrich worked example: frequent suffixes merge first,
        deterministically (freq desc, lexicographic tiebreak)."""
        from inxs_spark.operators.tokenizer import bpe_train_serial

        wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        merges = bpe_train_serial(wf, num_merges=3)
        # 'es' (9) then 'est' (9) then 'est</w>' (9) — the shared
        # suffix dominates every round
        assert merges == [("e", "s"), ("es", "t"), ("est", "</w>")]

    def test_min_pair_freq_stops_learning(self):
        from inxs_spark.operators.tokenizer import bpe_train_serial

        # every word unique => every pair freq 1 < min_pair_freq=2
        merges = bpe_train_serial({"abc": 1, "def": 1}, num_merges=10)
        assert merges == []

    def test_apply_equals_naive_sequential_passes(self):
        """apply_merges' symbol-set guard is an optimization only: it
        must equal the plain one-pass-per-merge-in-rank-order
        convention the SQL oracle replays with replace() folding."""
        from inxs_spark.operators.tokenizer import (
            EOW, apply_merges, bpe_train_serial,
        )

        wf = {"aaab": 4, "aab": 3, "abab": 5, "bbaa": 2, "a": 7}
        merges = bpe_train_serial(wf, num_merges=8, min_pair_freq=1)

        def naive(word):
            syms = list(word) + [EOW]
            for a, b in merges:
                out, i = [], 0
                while i < len(syms):
                    if (i < len(syms) - 1 and syms[i] == a
                            and syms[i + 1] == b):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        for w in ["aaab", "abab", "aaaaa", "bab", "xyz", "", "ba"]:
            assert apply_merges(w, merges) == naive(w), w

    def test_self_overlapping_pair_left_to_right(self):
        """(a,a) on 'aaa' must merge left-to-right non-overlapping:
        [aa, a, </w>] — the convention replace() folding reproduces."""
        from inxs_spark.operators.tokenizer import apply_merges

        assert apply_merges("aaa", [("a", "a")]) == ["aa", "a", "</w>"]
        assert apply_merges("aaaa", [("a", "a")]) == ["aa", "aa", "</w>"]

    def test_vocab_ids_and_decode(self):
        from inxs_spark.operators.tokenizer import BpeTokenizer, UNK

        tok = BpeTokenizer([("l", "o"), ("lo", "w")], set("lowner"))
        assert tok.vocab[UNK] == 0
        # alphabet ids are sorted and stable; merged symbols follow
        assert tok.vocab["lo"] < tok.vocab["low"]
        ids = tok.encode_ids("low zz")
        assert ids.count(0) == 2  # two OOV 'z' chars -> UNK
        assert tok.decode(tok.encode("low owner")) == "low owner"


class TestDistributedBpe:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            (i, " ".join(
                ["low", "lower", "lowest", "newest", "widest"][(i + j) % 5]
                for j in range(10)
            ))
            for i in range(50)
        ]
        return rows, spark.createDataFrame(rows, "doc_id long, text string")

    def test_train_and_distributed_encode_matches_serial(self, corpus):
        from inxs_spark.operators.tokenizer import bpe_encode, bpe_train

        rows, df = corpus
        tok = bpe_train(df, num_merges=25, sample_docs=50, max_words=100)
        assert len(tok.merges) > 0
        got = {r.doc_id: (list(r.tokens), r.n_tokens)
               for r in bpe_encode(df, tok).collect()}
        for i, t in rows:
            want = tok.encode(t)
            assert got[i] == (want, len(want)), i

    def test_train_sample_is_deterministic(self, corpus):
        from inxs_spark.operators.tokenizer import bpe_train

        _rows, df = corpus
        a = bpe_train(df, num_merges=15, sample_docs=20, max_words=50)
        b = bpe_train(df.repartition(7), num_merges=15, sample_docs=20,
                      max_words=50)
        assert a.merges == b.merges and a.vocab == b.vocab

    def test_pack_sequences_tokenizer_seam(self, corpus):
        """Packing with tokenizer= packs the SUBWORD stream: totals
        equal the serial encode (+1 eod per doc) and shard streams
        reconstruct in doc order."""
        from inxs_spark.operators.text import pack_sequences
        from inxs_spark.operators.tokenizer import bpe_train

        rows, df = corpus
        tok = bpe_train(df, num_merges=25, sample_docs=50, max_words=100)
        packed = pack_sequences(
            df, seq_len=16, n_shards=4, tokenizer=tok
        ).collect()
        total = sum(r.n_tokens for r in packed)
        assert total == sum(len(tok.encode(t)) + 1 for _i, t in rows)
        # within-shard stream equality vs serial reconstruction
        import hashlib

        by_shard = {}
        for r in sorted(packed, key=lambda r: (r.shard, r.seq_idx)):
            by_shard.setdefault(r.shard, []).extend(r.tokens)
        assign = {
            i: int(hashlib.md5(f"{i}:7".encode()).hexdigest()[:15], 16)
            % (1 << 20) % 4
            for i, _t in rows
        }
        for shard, stream in by_shard.items():
            want = [t for i, txt in rows if assign[i] == shard
                    for t in tok.encode(txt) + ["<eod>"]]
            assert stream == want, shard

    def test_chunk_documents_tokenizer_seam(self, corpus):
        from inxs_spark.operators.text import chunk_documents
        from inxs_spark.operators.tokenizer import bpe_train

        rows, df = corpus
        tok = bpe_train(df, num_merges=25, sample_docs=50, max_words=100)
        c = chunk_documents(df, chunk_tokens=6, overlap=2,
                            tokenizer=tok).collect()
        first = {r.doc_id: r for r in c if r.chunk_idx == 0}
        for i, t in rows[:5]:
            assert first[i].chunk_text.split(" ") == tok.encode(t)[:6]

    def test_save_load_roundtrip(self, corpus, tmp_path):
        from inxs_spark.operators.tokenizer import BpeTokenizer, bpe_train

        _rows, df = corpus
        tok = bpe_train(df, num_merges=10, sample_docs=20, max_words=50)
        p = str(tmp_path / "bpe.json")
        tok.save(p)
        tok2 = BpeTokenizer.load(p)
        assert tok2.merges == tok.merges and tok2.vocab == tok.vocab
        assert tok2.encode("lowest newest") == tok.encode("lowest newest")

    def test_ids_encode_distributed(self, corpus):
        from inxs_spark.operators.tokenizer import bpe_encode, bpe_train

        rows, df = corpus
        tok = bpe_train(df, num_merges=10, sample_docs=50, max_words=100)
        got = {r.doc_id: list(r.tokens)
               for r in bpe_encode(df, tok, ids=True).collect()}
        for i, t in rows[:5]:
            assert got[i] == tok.encode_ids(t), i
