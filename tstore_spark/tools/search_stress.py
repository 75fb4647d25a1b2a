"""Search-stack stress at corpus scale: planted terms/phrases with exact
expected answers, wall-clock timings per stage.

    python -m tstore_spark.tools.search_stress [local[N]] [n_docs]

Generates ``n_docs`` ~100-token documents JVM-side (the dedup_stress
generator shape: seeded hash arithmetic over a 10k-word vocabulary, no
Python in the generator), then plants EXACTLY countable structure:

- every doc ends with ``commonzero`` — a corpus-sized posting list (the
  stopword regime the flat-index design exists for);
- docs with ``doc_id % 1000 == 7`` also carry ``kneedle`` — a rare term
  with exactly ``n/1000`` postings;
- docs with ``doc_id % 500 == 3`` end with the adjacent phrase
  ``alphax bravox charliex`` — exactly ``n/500`` phrase hits.

Stages asserted exactly (any drift is a correctness bug, not noise):

1. ``build_inverted_index`` — needle df == n/1000, common df == n.
2. ``compress_postings -> decompress_postings`` on a 1/16 token slice —
   lossless row-set equality + compression accounting.
3. ``search_all_terms([kneedle, commonzero])`` — AND intersection
   through a corpus-sized posting == the planted n/1000 docs.
4. ``phrase_search`` — positional adjacency == n/500 docs.
5. ``bm25_topk(kneedle)`` — every returned doc is a planted needle doc
   (idf ranks the rare term; k <= n/1000).

Prints one JSON line with docs/sec per stage.
"""

from __future__ import annotations

import json
import sys
import time


def synth_corpus(spark, n_docs: int, vocab_size: int = 10_000, doc_tokens: int = 100):
    from pyspark.sql import functions as F

    df = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(doc_tokens)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("doc_id"), i), F.lit(vocab_size)).cast("string"),
            ),
        ),
    )
    text = F.concat(body, F.lit(" commonzero"))
    text = F.when(
        F.col("doc_id") % 1000 == 7, F.concat(text, F.lit(" kneedle"))
    ).otherwise(text)
    text = F.when(
        F.col("doc_id") % 500 == 3,
        F.concat(text, F.lit(" alphax bravox charliex")),
    ).otherwise(text)
    return df.select("doc_id", text.alias("text"))


def main(master: str = "local[16]", n_docs: int = 200_000) -> dict:
    from pyspark.sql import functions as F

    from tstore_spark.operators.postings import (
        compress_postings,
        decompress_postings,
    )
    from tstore_spark.operators.search import (
        bm25_topk,
        build_inverted_index,
        build_positional_index,
        phrase_search,
        search_all_terms,
    )
    from tstore_spark.session import get_spark

    spark = get_spark("search_stress", master=master)
    docs = synth_corpus(spark, n_docs).persist()
    docs.count()
    out: dict = {"n_docs": n_docs, "master": master}

    t0 = time.time()
    idx = build_inverted_index(docs).persist()
    n_postings = idx.count()
    t1 = time.time()
    out["index_s"] = round(t1 - t0, 2)
    out["index_docs_per_s"] = round(n_docs / (t1 - t0))
    out["n_postings"] = n_postings
    needle_df = idx.where(F.col("token") == "kneedle").count()
    common_df = idx.where(F.col("token") == "commonzero").count()
    assert needle_df == n_docs // 1000, (needle_df, n_docs // 1000)
    assert common_df == n_docs, (common_df, n_docs)

    # 2. postings compression on a deterministic 1/16 token slice
    t0 = time.time()
    sl = idx.where(F.pmod(F.xxhash64("token"), F.lit(16)) == 0).persist()
    n_slice = sl.count()
    chunks = compress_postings(sl, block_span=4096).persist()
    n_bytes = chunks.agg(F.sum("n_bytes")).collect()[0][0]
    back_n = decompress_postings(chunks, block_span=4096).count()
    t1 = time.time()
    assert back_n == n_slice, (back_n, n_slice)
    out["postings_s"] = round(t1 - t0, 2)
    out["postings_rows"] = n_slice
    out["postings_rows_per_s"] = round(n_slice / (t1 - t0))
    out["bytes_per_posting"] = round(n_bytes / max(n_slice, 1), 2)
    chunks.unpersist()
    sl.unpersist()

    # 3. AND search through a corpus-sized posting list
    t0 = time.time()
    hits = search_all_terms(idx, ["kneedle", "commonzero"]).count()
    t1 = time.time()
    assert hits == n_docs // 1000, (hits, n_docs // 1000)
    out["and_search_s"] = round(t1 - t0, 2)

    # 4. positional phrase
    t0 = time.time()
    pidx = build_positional_index(docs).persist()
    pidx.count()
    t2 = time.time()
    ph = phrase_search(pidx, ["alphax", "bravox", "charliex"]).count()
    t1 = time.time()
    assert ph == n_docs // 500, (ph, n_docs // 500)
    out["pindex_s"] = round(t2 - t0, 2)
    out["phrase_s"] = round(t1 - t2, 2)
    pidx.unpersist()

    # 5. BM25: rare term ranks only planted docs
    t0 = time.time()
    k = min(10, n_docs // 1000)
    top = bm25_topk(idx, ["kneedle"], k=k).collect()
    t1 = time.time()
    assert len(top) == k, (len(top), k)
    assert all(r["doc_id"] % 1000 == 7 for r in top), "non-needle doc in BM25 top-k"
    out["bm25_s"] = round(t1 - t0, 2)

    idx.unpersist()
    docs.unpersist()
    out["ok"] = True
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "local[16]",
        int(sys.argv[2]) if len(sys.argv) > 2 else 200_000,
    )
