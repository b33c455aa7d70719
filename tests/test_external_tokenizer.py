"""Worked example: a REAL (external) tokenizer's output through the
packing and LM-scoring operators.

`pipeline.text.bpe_tokens` is a regex pre-tokenizer, not a trained BPE —
the production contract is that a real tokenizer runs upstream (outside
Spark or as its own job) and lands an ``array<int>`` id column plus a
count column, and every downstream operator accepts those instead of
retokenizing:

- ``pack_chunks(token_column=...)``   — layout from the REAL counts;
- ``pack_sequences(token_array_column=...)`` — assembly of the REAL ids;
- ``unigram_model(token_array_column=...)`` /
  ``unigram_logprob(token_array_column=...)`` — LM statistics over the
  REAL id stream (n-grams joined on a unit separator, so subword strings
  containing spaces can't collide).

The fake "BPE" here is deterministic (ids minted from the doc id), with
lengths deliberately DIFFERENT from the whitespace token counts, so any
operator that silently fell back to retokenizing text would fail the
stream-equality assertions.

docs/curation.md carries the user-facing walkthrough of this flow.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sed_binning_spark.pipeline.lm import unigram_logprob, unigram_model
from sed_binning_spark.pipeline.pack import pack_chunks, pack_sequences

SEQ = 16


def _fake_bpe(doc_id: int, n: int) -> list[int]:
    """Deterministic stand-in for a trained BPE: n ids in [0, 50)."""
    return [((doc_id * 2654435761 + i * 40503) >> 7) % 50 for i in range(n)]


DOCS = [
    # (doc_id, n_bpe) — lengths straddle the budget: sub-sequence docs,
    # exact-fit, boundary-crossing, multi-sequence, empty, and NULL array
    (1, 5), (2, 16), (3, 23), (4, 40), (5, 1), (6, 7), (7, 0),
    (8, 31), (9, 16), (10, 2), (11, 64), (12, 9),
]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (did, "w " * (n + 3), _fake_bpe(did, n) if n else ([] if did == 7 else None))
        for did, n in DOCS
    ] + [(13, "tail words here", None)]  # NULL token array
    df = spark.createDataFrame(
        rows, "doc_id long, text string, bpe_ids array<int>",
    ).withColumn("n_bpe", F.size("bpe_ids").cast("bigint"))
    return df.cache()


def test_pack_layout_uses_real_counts_and_assembly_matches_the_stream(docs):
    """Count-path (pack_chunks on n_bpe) and array-path (pack_sequences on
    bpe_ids) must agree exactly: reassembling every sequence of a shard in
    seq_id order reproduces the concatenation of the shard's documents'
    REAL id arrays in id order — whitespace counts (deliberately n+3)
    never leak in."""
    man = pack_chunks(docs, seq_tokens=SEQ, n_shards=4, token_column="n_bpe")
    # layout rows carry the real counts
    by_doc = {r.doc_id: r.n_tokens for r in man.select("doc_id", "n_tokens").distinct().collect()}
    expect = {did: n for did, n in DOCS if n > 0}
    assert by_doc == expect

    seqs = pack_sequences(man, docs, token_array_column="bpe_ids").collect()
    # every sequence but each shard's tail is exactly full
    tails = {}
    for r in seqs:
        tails[r.shard] = max(tails.get(r.shard, -1), r.seq_id)
    for r in seqs:
        assert r.n_tokens == len(r.tokens)
        if r.seq_id != tails[r.shard]:
            assert r.n_tokens == SEQ, (r.shard, r.seq_id)

    # stream equality per shard
    shard_of = {r.doc_id: r.shard for r in man.select("doc_id", "shard").distinct().collect()}
    streams = {}
    for did in sorted(shard_of):
        streams.setdefault(shard_of[did], []).extend(_fake_bpe(did, dict(DOCS)[did]))
    got = {}
    for r in sorted(seqs, key=lambda r: (r.shard, r.seq_id)):
        got.setdefault(r.shard, []).extend(r.tokens)
    assert got == streams


def test_pack_sequences_rejects_a_mismatched_real_tokenization(docs):
    """Passing the count of one tokenization and the arrays of another
    violates the same-tokenization contract and must raise (two-sided
    n_tokens check)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException, SparkRuntimeException

    man = pack_chunks(docs, seq_tokens=SEQ, n_shards=4)  # whitespace counts
    with pytest.raises(
        (Py4JJavaError, SparkRuntimeException, PythonException),
        match="does not match the manifest",
    ):
        pack_sequences(man, docs, token_array_column="bpe_ids").collect()


def _bigram_ref(alpha=1.0):
    """Pure-Python micro-nat reference over the fake BPE id stream."""
    grams_by_doc = {}
    for did, n in DOCS:
        ids = _fake_bpe(did, n)
        grams_by_doc[did] = [
            f"{ids[i]}\x1f{ids[i + 1]}" for i in range(len(ids) - 1)
        ]
    counts = {}
    for gs in grams_by_doc.values():
        for g in gs:
            counts[g] = counts.get(g, 0) + 1
    total, vocab = sum(counts.values()), len(counts)
    denom = total + alpha * (vocab + 1)
    out = {}
    for did, gs in grams_by_doc.items():
        if not gs:
            out[did] = None
            continue
        micro = [
            round(math.log((counts.get(g, 0) + alpha) / denom) * 1e6) for g in gs
        ]
        out[did] = sum(micro) / (len(micro) * 1e6)
    out[13] = None  # NULL array -> NULL score
    return out


def test_lm_bigrams_over_real_token_ids_match_reference(docs):
    got = {
        r.doc_id: r.unigram_logprob
        for r in unigram_logprob(docs, n=2, token_array_column="bpe_ids").collect()
    }
    want = _bigram_ref()
    assert set(got) == set(want)
    for did, w in want.items():
        if w is None:
            assert got[did] is None, did
        else:
            assert got[did] == pytest.approx(w, abs=1e-12), did


def test_external_model_over_token_arrays(docs, spark):
    """An externally-built model (reference-corpus statistics) prices the
    scored corpus's ids: ids absent from the model score as OOV."""
    ref = spark.createDataFrame(
        [(100 + i, _fake_bpe(100 + i, 20)) for i in range(5)],
        "doc_id long, bpe_ids array<int>",
    )
    model = unigram_model(ref, token_array_column="bpe_ids", n=1)
    assert dict(model.dtypes)["token"] == "string"
    scored = unigram_logprob(
        docs, model=model, n=1, token_array_column="bpe_ids",
    )
    row = {r.doc_id: r.unigram_logprob for r in scored.collect()}
    assert row[1] is not None and row[13] is None
