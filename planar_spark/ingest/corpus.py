"""Deterministic corpus-scale fixtures: expand the sf documents /
embeddings tables to ~1M docs / ~200k vectors IN SPARK (pure column
expressions — explode + hash-seeded synthesis; nothing driver-side),
with planted structure so the dedup/ANN stack is exercised the way a
real crawl corpus exercises it:

- ~10% of docs arrive as NEAR-DUP PAIRS (same hash-seeded word stream,
  ~3 scattered word mutations → word-3-gram Jaccard ≈ 0.7, above the
  0.5 cluster threshold, below exact-dup);
- ~0.1% of docs are one global BOILERPLATE template (the classic
  footer/licence pile-up) — a single LSH bucket with ~1000 members,
  the adversarial shape _cap_buckets exists for: with max_bucket below
  the pile-up size the band join must sub-salt it instead of going
  quadratic;
- everything else is unique (disjoint hash-seeded vocabulary draws).

The expansion factor and word counts are arguments so the same
generator serves pytest (factor=4) and the bench's ~1M-doc row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def expand_documents(
    docs: DataFrame,
    factor: int = 200,
    words_per_doc: int = 80,
    vocab: int = 5000,
) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) -> ~factor x rows
    with planted near-dup pairs (replica s and s+1 when s % 10 == 0)
    and a global boilerplate template (hash(new_id) % 1000 == 7)."""
    w = int(words_per_doc)
    rep = docs.select(
        "doc_id", "lang", "source",
        F.explode(F.sequence(F.lit(0), F.lit(int(factor) - 1))).alias("s"),
    ).select(
        (F.col("doc_id") * factor + F.col("s")).alias("new_id"),
        "doc_id", "s", "lang", "source",
    )
    is_pair_copy = (F.pmod(F.col("s"), F.lit(10)) == 1) & (F.col("s") > 0)
    is_boiler = F.pmod(F.xxhash64("new_id"), F.lit(1000)) == 7
    # word-stream seed: pair copies reuse the PREVIOUS replica's seed;
    # boilerplate docs all share seed -1
    seed = F.when(is_boiler, F.lit(-1)).otherwise(
        F.col("doc_id") * factor
        + F.when(is_pair_copy, F.col("s") - 1).otherwise(F.col("s"))
    )
    # ~3 random scattered mutations PLUS one guaranteed position (the
    # random draws can all miss, which would make the copy an EXACT
    # dup) -> near-dup, never exact-dup
    forced_pos = F.pmod(F.xxhash64("new_id", F.lit(-7)), F.lit(w)) + 1
    words = F.transform(
        F.sequence(F.lit(1), F.lit(w)),
        lambda i: F.when(
            is_pair_copy
            & ~is_boiler
            & (
                (F.pmod(F.xxhash64(F.col("new_id"), i), F.lit(w)) < 3)
                | (i == forced_pos)
            ),
            F.concat(F.lit("m"), F.col("new_id"), F.lit("_"), i),
        ).otherwise(
            F.concat(F.lit("w"), F.pmod(F.xxhash64(seed, i), F.lit(vocab)))
        ),
    )
    # compute text BEFORE renaming new_id -> doc_id: lateral column
    # alias resolution would otherwise rebind the F.col("doc_id") refs
    # inside seed/words to the NEW alias instead of the base doc id
    return rep.select(
        "new_id", F.array_join(words, " ").alias("text"), "lang", "source"
    ).select(
        F.col("new_id").alias("doc_id"),
        "text",
        "lang",
        "source",
        F.length("text").alias("n_chars"),
    )


def expand_embeddings(embeddings: DataFrame, factor: int = 100) -> DataFrame:
    """embeddings(vec_id, embedding, label) -> ~factor x rows; each
    replica is the base vector plus a hash-seeded +-0.1 per-component
    jitter, so the base table's cluster structure survives (replicas
    stay near their cluster) and ANN recall stays meaningful."""
    rep = embeddings.select(
        "vec_id", "embedding", "label",
        F.explode(F.sequence(F.lit(0), F.lit(int(factor) - 1))).alias("s"),
    )
    jittered = F.transform(
        F.col("embedding"),
        lambda x, i: x
        + 0.1
        * (
            F.pmod(F.xxhash64(F.col("vec_id"), F.col("s"), i), F.lit(1001))
            / F.lit(500.0)
            - 1.0
        ).cast("float"),
    )
    return rep.select(
        (F.col("vec_id") * factor + F.col("s")).alias("vec_id"),
        jittered.alias("embedding"),
        "label",
    )
