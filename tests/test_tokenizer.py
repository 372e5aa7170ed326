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


class TestTokenizeJob:
    def test_train_then_frozen_encode(self, spark, tmp_path):
        """jobs.tokenize: train+encode writes the model and encoded
        parquet; a second run with --model encodes a new batch with
        the FROZEN model (identical segmentation, no retraining)."""
        from inxs_spark.jobs.tokenize import tokenize_job
        from inxs_spark.operators.tokenizer import BpeTokenizer

        rows = [(i, " ".join(
            ["low", "lower", "lowest", "newest", "widest"][(i + j) % 5]
            for j in range(8))) for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out1 = str(tmp_path / "tok1")
        s1 = tokenize_job(df, out1, num_merges=20, sample_docs=40,
                          max_words=100)
        assert s1["trained"] and s1["n_docs"] == 40
        assert s1["n_merges"] > 0 and s1["vocab_size"] > s1["n_merges"]
        tok = BpeTokenizer.load(s1["model_path"])
        got = {r.doc_id: list(r.tokens)
               for r in spark.read.parquet(s1["output_path"]).collect()}
        assert got[0] == tok.encode(rows[0][1])

        batch = spark.createDataFrame(
            [(100, "lowest newest"), (101, "low low low")],
            "doc_id long, text string",
        )
        out2 = str(tmp_path / "tok2")
        s2 = tokenize_job(batch, out2, model_path=s1["model_path"])
        assert not s2["trained"] and s2["model_path"] == s1["model_path"]
        enc2 = {r.doc_id: list(r.tokens)
                for r in spark.read.parquet(s2["output_path"]).collect()}
        assert enc2[100] == tok.encode("lowest newest")

    def test_cli_roundtrip(self, spark, tmp_path):
        """The module CLI end-to-end with --ids (separate session via
        subprocess would be slow; drive main() in-process the way the
        other job CLI tests do is not possible since it builds its own
        session — use a subprocess with a tiny input)."""
        import json as _json
        import subprocess
        import sys

        inp = str(tmp_path / "docs")
        spark.createDataFrame(
            [(1, "aa ab aa ab"), (2, "ab aa ab aa")],
            "doc_id long, text string",
        ).write.parquet(inp)
        out = str(tmp_path / "cli_out")
        proc = subprocess.run(
            [sys.executable, "-m", "inxs_spark.jobs.tokenize",
             "--input", inp, "--out", out, "--num-merges", "5",
             "--ids", "--master", "local[2]"],
            capture_output=True, text=True, timeout=300,
            cwd="/root/repo",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        stats = _json.loads(proc.stdout.strip().splitlines()[-1])
        assert stats["n_docs"] == 2 and stats["n_tokens"] > 0
        enc = spark.read.parquet(out + "/encoded").collect()
        assert all(isinstance(t, int) for r in enc for t in r.tokens)
