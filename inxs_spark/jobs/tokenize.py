"""Standalone tokenizer job: train a BPE model on a corpus (bounded
sample, driver-side merges) and/or encode a corpus with a trained model.

    # train + encode in one run (model saved beside the output)
    python -m inxs_spark.jobs.tokenize --input docs.parquet --out /out \
        --num-merges 8192

    # encode a NEW batch with a FROZEN model (the incremental mode:
    # growing corpora must not retrain per batch or token ids drift)
    python -m inxs_spark.jobs.tokenize --input batch.parquet --out /out2 \
        --model /out/bpe.json

Outputs under ``--out``:

    bpe.json     the model (merges + alphabet; reconstructs the
                 identical tokenizer anywhere) — training runs only
    encoded/     parquet (id, tokens array<string> | array<int> with
                 --ids, n_tokens)

The job prints ONE JSON line (model size, corpus/token counts, walls),
mirroring the other jobs' contract. Scale shape: training cost is
O(sample) at any corpus size (hash-ordered doc sample + distributed
word counts); encoding is one Arrow hop, no shuffle.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def tokenize_job(
    df: DataFrame,
    out_root: str,
    model_path: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_merges: int = 8192,
    sample_docs: int = 4096,
    max_words: int = 30_000,
    ids: bool = False,
) -> dict:
    """Train (unless ``model_path`` loads a frozen model) and encode;
    returns the stats dict main() prints."""
    from ..operators.tokenizer import BpeTokenizer, bpe_encode, bpe_train

    os.makedirs(out_root, exist_ok=True)
    walls: dict[str, float] = {}
    t0 = time.monotonic()
    if model_path is not None:
        tok = BpeTokenizer.load(model_path)
        trained = False
    else:
        tok = bpe_train(
            df, text_col=text_col, num_merges=num_merges,
            sample_docs=sample_docs, max_words=max_words,
        )
        model_path = os.path.join(out_root, "bpe.json")
        tok.save(model_path)
        trained = True
    walls["train_or_load"] = round(time.monotonic() - t0, 3)

    t = time.monotonic()
    enc_path = os.path.join(out_root, "encoded")
    enc = bpe_encode(df, tok, id_col=id_col, text_col=text_col, ids=ids)
    enc.write.mode("overwrite").parquet(enc_path)
    out = df.sparkSession.read.parquet(enc_path)
    agg = out.selectExpr(
        "count(*) AS n_docs", "sum(n_tokens) AS n_tokens"
    ).first()
    walls["encode"] = round(time.monotonic() - t, 3)
    return {
        "trained": trained,
        "model_path": model_path,
        "n_merges": len(tok.merges),
        "vocab_size": len(tok.vocab),
        "n_docs": agg.n_docs,
        "n_tokens": int(agg.n_tokens or 0),
        "output_path": enc_path,
        "walls_s": walls,
    }


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="inxs_spark.jobs.tokenize")
    parser.add_argument("--input", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--model", default=None,
                        help="frozen bpe.json to encode with (skips training)")
    parser.add_argument("--id-col", default="doc_id")
    parser.add_argument("--text-col", default="text")
    parser.add_argument("--num-merges", type=int, default=8192)
    parser.add_argument("--sample-docs", type=int, default=4096)
    parser.add_argument("--max-words", type=int, default=30_000)
    parser.add_argument("--ids", action="store_true",
                        help="emit token-id arrays instead of strings")
    parser.add_argument("--master", default="local[*]")
    args = parser.parse_args(argv)

    from ..sources.session import get_spark

    spark: SparkSession = get_spark(
        master=args.master, app_name="inxs_spark-tokenize"
    )
    try:
        stats = tokenize_job(
            spark.read.parquet(args.input), args.out,
            model_path=args.model, id_col=args.id_col,
            text_col=args.text_col, num_merges=args.num_merges,
            sample_docs=args.sample_docs, max_words=args.max_words,
            ids=args.ids,
        )
        print(json.dumps(stats))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
