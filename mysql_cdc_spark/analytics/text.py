"""Training-data text pipeline over the ``documents`` table.

Large-scale dedup / quality / fingerprinting operators a 100 TB corpus
pipeline needs, each expressed with JVM-side built-ins (higher-order array
functions — zero Python in the hot path) and paired with a semantically
identical DuckDB oracle.

Shared hash: ``H(s) = int64(first 15 hex chars of md5(s))`` — md5 is
bit-identical across engines, 60 bits fits a signed int64. All ratios are
rounded to fixed decimals so double formatting can't drift.

Operators:
- text_tokens        token counting (whitespace split, BPE-ish subword est.)
- text_quality       quality scoring (punct/short-word/digit ratios)
- text_langid        marker-word language ID (deterministic n-gram heuristic)
- text_fingerprint   document fingerprinting (md5 full + prefix fingerprint)
- dedup_exact        exact dedup by normalized-text hash
- dedup_prefix       near-dup groups by prefix fingerprint
- text_simhash       32-bit SimHash over unigram hashes
- minhash_lsh_neardup  MinHash (k=8, integer affine family over one
                       56-bit digest per shingle) → 4-band LSH →
                       candidate pairs with exact Jaccard verification
- text_redact_pii    email/phone span counting + redaction (codegen
                     regexp passes; redacted-text hash oracle-checked)
- doc_train_split    deterministic hash train/val/test split by lang
- token_histogram    corpus-wide top-25 token heavy hitters
- ngram_jaccard(_lsh)  exact blocked / LSH-candidate 3-gram Jaccard
- tfidf_top_terms    per-language TF-IDF top terms
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load

# normalized word array (lowercase, whitespace split)
WORDS = r"split(lower(trim(text)), '\\s+')"
WORDS_DUCK = r"regexp_split_to_array(lower(trim(text)), '\s+')"

# shared 60-bit hash of a string expression
def _h(expr: str) -> str:  # Spark dialect
    return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"


def _h_duck(expr: str) -> str:  # DuckDB dialect
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate (ceil(chars/4)
    per word — the common ~4-chars-per-token rule) + char count.

    Pure `split`/`size`/`aggregate` — whole-stage codegen, no UDF, linear
    scan; at 100 TB this is the cheapest possible pass over the corpus.
    """
    docs = load(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        f"size({WORDS}) as n_tokens",
        f"aggregate({WORDS}, 0L, (acc, w) -> acc + cast(ceil(length(w) / 4.0) as bigint)) as n_subwords",
        "length(text) as n_chars_measured",
        "n_chars",
    )


TOKENS_SQL = f"""
SELECT doc_id,
       len({WORDS_DUCK}) AS n_tokens,
       list_sum(list_transform({WORDS_DUCK},
                w -> ceil(length(w) / 4.0)::BIGINT))::BIGINT AS n_subwords,
       length(text) AS n_chars_measured,
       n_chars
FROM documents
"""


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features: punctuation ratio, digit ratio,
    short-word ratio, mean token length — the standard cheap filters a
    pretraining pipeline runs before anything expensive."""
    docs = load(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        f"size({WORDS}) as n_tokens",
        r"round(length(regexp_replace(lower(text), '[a-z0-9\\s]', '')) / length(text), 4) as punct_ratio",
        r"round(length(regexp_replace(text, '[^0-9]', '')) / length(text), 4) as digit_ratio",
        f"round(size(filter({WORDS}, w -> length(w) <= 3)) / size({WORDS}), 4) as short_word_ratio",
        f"round(aggregate({WORDS}, 0L, (acc, w) -> acc + length(w)) / size({WORDS}), 4) as mean_token_len",
    )


QUALITY_SQL = rf"""
SELECT doc_id,
       len({WORDS_DUCK}) AS n_tokens,
       round(length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g'))
             / length(text), 4) AS punct_ratio,
       round(length(regexp_replace(text, '[^0-9]', '', 'g'))
             / length(text), 4) AS digit_ratio,
       round(len(list_filter({WORDS_DUCK}, w -> length(w) <= 3))
             / len({WORDS_DUCK})::DOUBLE, 4) AS short_word_ratio,
       round(list_sum(list_transform({WORDS_DUCK}, w -> length(w)))
             / len({WORDS_DUCK})::DOUBLE, 4) AS mean_token_len
FROM documents
"""


# ---------------------------------------------------------------------------
# language ID (deterministic marker-word n-gram heuristic)
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ["the", "a", "and", "of"],
    "de": ["der", "die", "und", "ist"],
    "fr": ["le", "la", "et", "est"],
    "es": ["el", "los", "y", "es"],
    "zh": ["de5", "shi4", "le5", "he2"],
}


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word scoring: count hits per language profile, argmax with
    'und' (undetermined) when no profile hits. Deterministic tie-break by
    profile order. The corpus is synthetic so accuracy is meaningless; the
    operator (profile scoring over token arrays, pure built-ins) is what a
    real langid pass uses with real profiles."""
    docs = load(spark, sf_dir, "documents")
    scores = [
        f"size(filter({WORDS}, w -> w in ({', '.join(repr(m) for m in ms)}))) as score_{lang}"
        for lang, ms in _LANG_MARKERS.items()
    ]
    scored = docs.selectExpr("doc_id", "lang", *scores)
    langs = list(_LANG_MARKERS)
    best = _argmax_case(langs) + " as pred_lang"
    return scored.selectExpr("doc_id", "lang", *[f"score_{l}" for l in langs], best)


def _argmax_case(langs: list[str]) -> str:
    """CASE picking the first language with the max score; 'und' when all
    scores are 0. Dialect-neutral (plain comparisons)."""
    zero = " AND ".join(f"score_{l} <= 0" for l in langs)
    whens = "".join(
        "WHEN "
        + " AND ".join(f"score_{l} >= score_{o}" for o in langs if o != l)
        + f" THEN '{l}' "
        for l in langs
    )
    return f"CASE WHEN {zero} THEN 'und' {whens}ELSE 'und' END"


def _langid_sql() -> str:
    scores = ", ".join(
        f"len(list_filter({WORDS_DUCK}, w -> list_contains([{', '.join(repr(m) for m in ms)}], w))) AS score_{lang}"
        for lang, ms in _LANG_MARKERS.items()
    )
    langs = list(_LANG_MARKERS)
    best = _argmax_case(langs) + " AS pred_lang"
    cols = ", ".join(f"score_{l}" for l in langs)
    return f"""
WITH scored AS (SELECT doc_id, lang, {scores} FROM documents)
SELECT doc_id, lang, {cols}, {best} FROM scored
"""


LANGID_SQL = _langid_sql()


# ---------------------------------------------------------------------------
# fingerprinting + exact / prefix dedup
# ---------------------------------------------------------------------------

def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: md5 over the whitespace-normalized text
    (exact-dup key) and over the first 8 tokens (prefix near-dup key —
    a cheap stand-in for a rolling-hash fingerprint)."""
    docs = load(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        f"md5(array_join({WORDS}, ' ')) as fp_full",
        f"md5(array_join(slice({WORDS}, 1, 8), ' ')) as fp_prefix",
    )


FINGERPRINT_SQL = f"""
SELECT doc_id,
       md5(array_to_string({WORDS_DUCK}, ' ')) AS fp_full,
       md5(array_to_string({WORDS_DUCK}[1:8], ' ')) AS fp_prefix
FROM documents
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the normalized-text fingerprint; emit
    one row per duplicate group (canonical = min doc_id). Shuffles the
    16-byte hash + doc_id only — never the text — so at 100 TB the
    exchange is ~24 B/doc.

    The corpus is augmented with a deterministic re-crawl slice (every
    97th doc re-ingested under a shifted id — the duplicate shape a real
    multi-crawl corpus has) so the dedup output is non-empty and the
    oracle comparison discriminates; the synthetic testdata itself
    contains no exact duplicates."""
    docs = load(spark, sf_dir, "documents")
    recrawl = docs.filter(F.col("doc_id") % 97 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000)
    )
    corpus = docs.unionByName(recrawl)
    fps = corpus.selectExpr(
        "doc_id", f"md5(array_join({WORDS}, ' ')) as fp_full"
    )
    return (
        fps.groupBy("fp_full")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


DEDUP_EXACT_SQL = f"""
WITH corpus AS (
  SELECT * FROM documents
  UNION ALL
  SELECT * REPLACE (doc_id + 10000000 AS doc_id) FROM documents
  WHERE doc_id % 97 = 0
), fps AS (
  SELECT doc_id, md5(array_to_string({WORDS_DUCK}, ' ')) AS fp_full FROM corpus
)
SELECT fp_full, count(*) AS n_copies, min(doc_id) AS canonical_doc_id,
       max(doc_id) AS max_doc_id
FROM fps GROUP BY fp_full HAVING count(*) > 1
"""


def dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup groups sharing the 8-token prefix fingerprint."""
    fps = text_fingerprint(spark, sf_dir)
    return (
        fps.groupBy("fp_prefix")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_members") > 1)
    )


DEDUP_PREFIX_SQL = f"""
WITH fps AS (
  SELECT doc_id, md5(array_to_string({WORDS_DUCK}[1:8], ' ')) AS fp_prefix FROM documents
)
SELECT fp_prefix, count(*) AS n_members, min(doc_id) AS canonical_doc_id
FROM fps GROUP BY fp_prefix HAVING count(*) > 1
"""


# ---------------------------------------------------------------------------
# SimHash (32-bit, unigram hashes)
# ---------------------------------------------------------------------------

def text_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash: per bit b, sum sign(bit b of H(w)) over distinct
    words; bit set iff sum > 0. All in nested higher-order functions —
    no shuffle at all (embarrassingly parallel scan)."""
    docs = load(spark, sf_dir, "documents")
    hs = f"transform(array_distinct({WORDS}), w -> {_h('w')})"
    simhash = (
        f"aggregate(sequence(0, 31), 0L, (acc, b) -> acc + "
        f"(CASE WHEN aggregate(hs, 0L, (a2, h) -> a2 + "
        f"(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN shiftleft(1L, b) ELSE 0L END)) as simhash"
    )
    return docs.selectExpr("doc_id", f"{hs} as hs").selectExpr(
        "doc_id", simhash, "size(hs) as n_distinct_words"
    )


SIMHASH_SQL = f"""
WITH h AS (
  SELECT doc_id,
         list_transform(list_distinct({WORDS_DUCK}), w -> {_h_duck('w')}) AS hs
  FROM documents
)
SELECT doc_id,
       list_sum(list_transform(range(0, 32), b ->
         CASE WHEN list_sum(list_transform(hs, h2 ->
                CASE WHEN ((h2 >> b) & 1) = 1 THEN 1 ELSE -1 END)) > 0
              THEN (1::BIGINT << b) ELSE 0 END))::BIGINT AS simhash,
       len(hs) AS n_distinct_words
FROM h
"""


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup candidate pairs with Jaccard verification
# ---------------------------------------------------------------------------

_K = 8        # minhash signatures
_BANDS = 4    # LSH bands (2 rows each)


def _shingles(words_expr: str, dialect: str) -> str:
    """Word 3-gram shingle array (distinct)."""
    if dialect == "spark":
        return (
            f"array_distinct(CASE WHEN size({words_expr}) >= 3 THEN "
            f"transform(sequence(1, size({words_expr}) - 2), "
            f"i -> array_join(slice({words_expr}, i, 3), ' ')) "
            f"ELSE array(array_join({words_expr}, ' ')) END)"
        )
    return (
        f"list_distinct(CASE WHEN len({words_expr}) >= 3 THEN "
        f"list_transform(range(1, len({words_expr}) - 1), "
        f"i -> array_to_string({words_expr}[i:i+2], ' ')) "
        f"ELSE [array_to_string({words_expr}, ' ')] END)"
    )


# k affine minhash functions over ONE 56-bit md5 key per shingle:
# mh_i(k) = (k·A_i + B_i) mod (2^61 − 1). Mersenne-prime universal
# hashing — all integer ops, so the interpreted-lambda cost per shingle
# is one md5 + one conv, not k substring/conv passes. A_i small and odd
# keeps k·A_i < 2^63 for 56-bit keys (no ANSI overflow).
_P61 = (1 << 61) - 1
_MH_A = [3, 5, 7, 11, 13, 17, 19, 23]
_MH_B = [
    981753259817532957, 157981532459817311, 735112909817532163,
    359817533159812377, 611983275981753301, 131579813159811471,
    871531197531119733, 419817531198137568,
]


def _h14(expr: str) -> str:  # Spark: 56-bit shingle key
    return f"cast(conv(substring(md5({expr}), 1, 14), 16, 10) as bigint)"


def _h14_duck(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 14))::BIGINT)"


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    out_prefix: str = "doc",
) -> DataFrame:
    """MinHash+LSH near-duplicate pair mining over any (id, text) frame —
    the reusable core behind ``minhash_lsh_neardup`` (documents table)
    and ``transcripts.conversation_neardup`` (reassembled conversations).

    Returns ``({out_prefix}_a, {out_prefix}_b, jaccard)`` with exact
    verified Jaccard ≥ ``threshold``. See ``minhash_lsh_neardup`` for
    the staging/scale rationale.
    """
    words = rf"split(lower(trim({text_col})), '\\s+')"
    sh = _shingles(words, "spark")
    mh = [
        f"array_min(transform(shingles, k -> (k * {a} + {b}) % {_P61})) as mh{i}"
        for i, (a, b) in enumerate(zip(_MH_A, _MH_B))
    ]
    sig = (
        df.selectExpr(f"{id_col} as _nd_id", f"{sh} as sh_text")
        .selectExpr("_nd_id", f"transform(sh_text, s -> {_h14('s')}) as shingles")
        .selectExpr("_nd_id", "shingles", *mh)
        .persist()
    )
    band_cols = ", ".join(
        f"named_struct('band', {b}, 'key', md5(concat_ws(',', mh{2*b}, mh{2*b+1})))"
        for b in range(_BANDS)
    )
    # banded rows carry ONLY (id, band, key) — the shingle arrays never
    # enter the bucket join; at corpus scale the exchange is ~40 B/doc/band
    banded = sig.selectExpr("_nd_id", f"explode(array({band_cols})) as bk").selectExpr(
        "_nd_id", "bk.band as band", "bk.key as key"
    )
    ca, cb = f"{out_prefix}_a", f"{out_prefix}_b"
    a = banded.selectExpr(f"_nd_id as {ca}", "band", "key")
    b = banded.selectExpr(f"_nd_id as {cb}", "band", "key")
    pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col(ca) < F.col(cb))
        .select(ca, cb)
        .distinct()
    )
    # verification joins attach shingles only to surviving candidates
    sh_df = sig.select("_nd_id", "shingles")
    return (
        pairs.join(sh_df.selectExpr(f"_nd_id as {ca}", "shingles as sh_a"), ca)
        .join(sh_df.selectExpr(f"_nd_id as {cb}", "shingles as sh_b"), cb)
        .selectExpr(
            ca,
            cb,
            "round(size(array_intersect(sh_a, sh_b)) / size(array_union(sh_a, sh_b)), 4) as jaccard",
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate detection, the scale path for corpus
    dedup (shingle → minhash → band → bucket-join → verify):

    1. per doc: distinct word-3-gram shingles (array ops, no explode),
       immediately reduced to 56-bit integer keys — one md5 per shingle,
       the only string hashing in the plan;
    2. k=8 minhashes: affine maps of the SAME key mod a Mersenne prime
       (integer-only lambdas) — signature computed without shuffling a
       single shingle;
    3. 4 bands × 2 rows: band key = md5 of the band's signature slice;
       docs explode to 4 (band, key) rows — the only multiplied data is
       4 × 40 bytes per doc, never text;
    4. bucket self-join on (band, key) with doc_a < doc_b → candidates
       (dedup'd across bands) — at 10^10 docs this join is the classic
       LSH trick: only docs agreeing on a full band ever meet;
    5. exact verification: join candidates back to the *integer* shingle
       keys, Jaccard = |∩|/|∪| via array_intersect/array_union over
       bigint arrays (cheaper to shuffle and compare than shingle text),
       keep ≥ 0.5.
    """
    docs = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)


def minhash_pairs_sql(
    relation: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    out_prefix: str = "doc",
) -> str:
    """DuckDB twin of ``minhash_lsh_pairs`` — same shingles, hash family,
    banding, and verification over ``relation(id_col, text_col)``.
    Emitted as a bare CTE chain + final SELECT (no leading ``WITH``), so
    it composes after an existing ``WITH x AS (...),`` prefix or runs
    standalone with ``"WITH " + minhash_pairs_sql(...)``."""
    words = rf"regexp_split_to_array(lower(trim({text_col})), '\s+')"
    sh = _shingles(words, "duck")
    mh = ", ".join(
        f"list_min(list_transform(shingles, k -> (k * {a} + {b}) % {_P61})) AS mh{i}"
        for i, (a, b) in enumerate(zip(_MH_A, _MH_B))
    )
    band_rows = " UNION ALL ".join(
        f"SELECT _nd_id, shingles, {b} AS band, "
        f"md5(mh{2*b}::VARCHAR || ',' || mh{2*b+1}::VARCHAR) AS key FROM nd_sig"
        for b in range(_BANDS)
    )
    ca, cb = f"{out_prefix}_a", f"{out_prefix}_b"
    return f"""
nd_sh AS (
  SELECT {id_col} AS _nd_id,
         list_transform({sh}, s -> {_h14_duck('s')}) AS shingles
  FROM {relation}
), nd_sig AS (
  SELECT _nd_id, shingles, {mh} FROM nd_sh
), nd_banded AS (
  {band_rows}
), nd_pairs AS (
  SELECT DISTINCT a._nd_id AS {ca}, b._nd_id AS {cb}
  FROM nd_banded a JOIN nd_banded b
    ON a.band = b.band AND a.key = b.key AND a._nd_id < b._nd_id
)
SELECT p.{ca}, p.{cb},
       round(len(list_intersect(sa.shingles, sb.shingles))
             / len(list_distinct(list_concat(sa.shingles, sb.shingles)))::DOUBLE,
             4) AS jaccard
FROM nd_pairs p
JOIN nd_sh sa ON p.{ca} = sa._nd_id
JOIN nd_sh sb ON p.{cb} = sb._nd_id
WHERE round(len(list_intersect(sa.shingles, sb.shingles))
            / len(list_distinct(list_concat(sa.shingles, sb.shingles)))::DOUBLE,
            4) >= {threshold}
"""


MINHASH_SQL = "WITH " + minhash_pairs_sql("documents", "doc_id", "text")


# ---------------------------------------------------------------------------
# standalone n-gram Jaccard (restricted pair space) + per-language TF-IDF
# ---------------------------------------------------------------------------

# round(j, 4) >= 0.2 admits true Jaccard down to this boundary; every
# candidate-pruning bound below must use it, not 0.2 itself.
_JACCARD_T = 0.19995


def _jaccard_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles(WORDS, "spark")
    return load(spark, sf_dir, "documents").selectExpr(
        "doc_id", "lang", "cast(floor(n_chars / 100) as int) as len_bucket",
        f"{sh} as shingles",
    )


def _jaccard_verify(cand: DataFrame, base: DataFrame) -> DataFrame:
    """(doc_a, doc_b) candidates → exact verified pairs, the shared final
    stage of every candidate-generation strategy below."""
    a = base.selectExpr("doc_id as doc_a", "lang", "shingles as sh_a")
    b = base.selectExpr("doc_id as doc_b", "shingles as sh_b")
    return (
        cand.select("doc_a", "doc_b")
        .join(a, "doc_a")
        .join(b, "doc_b")
        .selectExpr(
            "doc_a", "doc_b", "lang",
            "round(size(array_intersect(sh_a, sh_b)) / size(array_union(sh_a, sh_b)), 4) as jaccard",
        )
        .filter(F.col("jaccard") >= 0.2)
    )


def _ngram_jaccard_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadratic-within-(lang, len_bucket) reference formulation — kept
    only as the obviously-correct twin the parity test checks the
    prefix-filtered form against (tests/test_text_exact_joins.py)."""
    base = _jaccard_base(spark, sf_dir)
    a = base.selectExpr("doc_id as doc_a", "lang", "len_bucket", "shingles as sh_a")
    b = base.selectExpr("doc_id as doc_b", "lang", "len_bucket", "shingles as sh_b")
    return (
        a.join(b, ["lang", "len_bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .selectExpr(
            "doc_a", "doc_b", "lang",
            "round(size(array_intersect(sh_a, sh_b)) / size(array_union(sh_a, sh_b)), 4) as jaccard",
        )
        .filter(F.col("jaccard") >= 0.2)
    )


def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT pairwise word-3-gram Jaccard ≥ 0.2 within (lang,
    length-bucket) blocks, via AllPairs/PPJoin-style prefix filtering
    (Bayardo et al. WWW'07, Xiao et al. WWW'08) instead of the quadratic
    within-block cross join:

    - order shingles by ascending global document frequency (rarest
      first; any total order is correct — df order keeps boilerplate
      shingles out of the index for all but the largest sets);
    - for Jaccard ≥ t two sets must share a token inside their first
      ``|s| − ceil(t·|s|) + 1`` tokens of that order, so only those
      prefixes are exploded into the inverted index;
    - candidates = prefix-token equi-join within the block, pruned
      further by the length filter ``t·|a| ≤ |b| ≤ |a|/t``, then the
      exact intersect/union verify (same formula as before).

    Lossless — the oracle stays the quadratic DuckDB SQL — but candidate
    space is Σ_token df², not Σ_block n²: unrelated same-block docs never
    pair. At t = 0.2 prefixes are ~80% of each set (weak per-set pruning
    — the price of a low threshold); the zero-shared-shingle cut is what
    removes the quadratic blow-up. Pair-explosion from a shingle shared
    by 10^6 docs is the residual skew risk, mitigated by the df ordering
    and ultimately by the LSH twin (``ngram_jaccard_lsh``)."""
    base = _jaccard_base(spark, sf_dir)
    toks = base.selectExpr(
        "doc_id", "lang", "len_bucket", "size(shingles) as sz",
        "explode(shingles) as tok",
    )
    df_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    prefix_len = f"greatest(sz - cast(ceil({_JACCARD_T}D * sz) as int) + 1, 0)"
    pre = (
        toks.join(df_counts, "tok")
        .groupBy("doc_id", "lang", "len_bucket", "sz")
        .agg(F.expr("transform(array_sort(collect_list(struct(df, tok))), s -> s.tok)").alias("ordered"))
        .selectExpr("doc_id", "lang", "len_bucket", "sz", f"slice(ordered, 1, {prefix_len}) as prefix")
        .selectExpr("doc_id", "lang", "len_bucket", "sz", "explode(prefix) as tok")
    )
    a = pre.selectExpr("doc_id as doc_a", "lang", "len_bucket", "sz as sz_a", "tok")
    b = pre.selectExpr("doc_id as doc_b", "lang", "len_bucket", "sz as sz_b", "tok")
    cand = (
        a.join(b, ["lang", "len_bucket", "tok"])
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("sz_b") >= _JACCARD_T * F.col("sz_a"))
            & (F.col("sz_a") >= _JACCARD_T * F.col("sz_b"))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _jaccard_verify(cand, base)


def ngram_jaccard_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate twin of ``ngram_jaccard``: same verification formula
    (word-3-gram Jaccard ≥ 0.2, same-language pairs) but candidates come
    from MinHash LSH banding instead of the exact prefix-filtered index —
    banding bounds pair space by band-bucket sizes even when a hot
    shingle would explode the exact form's inverted index, at the
    standard probabilistic-recall cost.

    Banding is tuned for the low 0.2 threshold: 8 bands × 1 row (band key
    = one minhash), so P(candidate | jaccard=s) = 1-(1-s)^8 — ≈0.83 at
    s=0.2, ≈0.96 at s=0.33, →1 for near-dups. The exact blocked form
    stays as the verification baseline; recall-vs-cost is the standard
    LSH knob (more single-row bands → higher recall, bigger buckets)."""
    docs = load(spark, sf_dir, "documents")
    sh = _shingles(WORDS, "spark")
    # same integer-key minhash family as minhash_lsh_neardup: one md5 per
    # shingle, k affine maps mod a Mersenne prime
    mh = [
        f"array_min(transform(shingles, k -> (k * {a} + {b}) % {_P61})) as mh{i}"
        for i, (a, b) in enumerate(zip(_MH_A, _MH_B))
    ]
    sig = (
        docs.selectExpr("doc_id", "lang", f"{sh} as sh_text")
        .selectExpr(
            "doc_id", "lang",
            f"transform(sh_text, s -> {_h14('s')}) as shingles",
        )
        .selectExpr("doc_id", "lang", "shingles", *mh)
        .persist()
    )
    band_cols = ", ".join(
        f"named_struct('band', {i}, 'key', mh{i})" for i in range(_K)
    )
    banded = sig.selectExpr(
        "doc_id", f"explode(array({band_cols})) as bk"
    ).selectExpr("doc_id", "bk.band as band", "bk.key as key")
    a = banded.selectExpr("doc_id as doc_a", "band", "key")
    b = banded.selectExpr("doc_id as doc_b", "band", "key")
    pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sh_df = sig.select("doc_id", "lang", "shingles")
    return (
        pairs.join(
            sh_df.selectExpr("doc_id as doc_a", "lang as lang_a", "shingles as sh_a"),
            "doc_a",
        )
        .join(
            sh_df.selectExpr("doc_id as doc_b", "lang as lang_b", "shingles as sh_b"),
            "doc_b",
        )
        .filter(F.col("lang_a") == F.col("lang_b"))
        .selectExpr(
            "doc_a", "doc_b", "lang_a as lang",
            "round(size(array_intersect(sh_a, sh_b)) / size(array_union(sh_a, sh_b)), 4) as jaccard",
        )
        .filter(F.col("jaccard") >= 0.2)
    )


def _ngram_jaccard_lsh_sql() -> str:
    sh = _shingles(WORDS_DUCK, "duck")
    mh = ", ".join(
        f"list_min(list_transform(shingles, k -> (k * {a} + {b}) % {_P61})) AS mh{i}"
        for i, (a, b) in enumerate(zip(_MH_A, _MH_B))
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {i} AS band, mh{i} AS key FROM sig" for i in range(_K)
    )
    return f"""
WITH docs_sh AS (
  SELECT doc_id, lang,
         list_transform({sh}, s -> {_h14_duck('s')}) AS shingles
  FROM documents
), sig AS (
  SELECT doc_id, lang, shingles, {mh} FROM docs_sh
), banded AS (
  {band_rows}
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT p.doc_a, p.doc_b, sa.lang,
       round(len(list_intersect(sa.shingles, sb.shingles))
             / len(list_distinct(list_concat(sa.shingles, sb.shingles)))::DOUBLE,
             4) AS jaccard
FROM pairs p
JOIN docs_sh sa ON p.doc_a = sa.doc_id
JOIN docs_sh sb ON p.doc_b = sb.doc_id
WHERE sa.lang = sb.lang
  AND round(len(list_intersect(sa.shingles, sb.shingles))
            / len(list_distinct(list_concat(sa.shingles, sb.shingles)))::DOUBLE,
            4) >= 0.2
"""


NGRAM_JACCARD_LSH_SQL = _ngram_jaccard_lsh_sql()


NGRAM_JACCARD_SQL = f"""
WITH base AS (
  SELECT doc_id, lang, (n_chars // 100)::INT AS len_bucket,
         {_shingles(WORDS_DUCK, "duck")} AS shingles
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang,
       round(len(list_intersect(a.shingles, b.shingles))
             / len(list_distinct(list_concat(a.shingles, b.shingles)))::DOUBLE,
             4) AS jaccard
FROM base a
JOIN base b ON a.lang = b.lang AND a.len_bucket = b.len_bucket
           AND a.doc_id < b.doc_id
WHERE round(len(list_intersect(a.shingles, b.shingles))
            / len(list_distinct(list_concat(a.shingles, b.shingles)))::DOUBLE,
            4) >= 0.2
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per language: distinct-word explode → document
    frequency → idf → per-(lang, word) tf → rank. The only shuffles are on
    the word key (df) and (lang, word) (tf) — both combine map-side."""
    docs = load(spark, sf_dir, "documents")
    words = docs.selectExpr(
        "doc_id", "lang", f"explode(array_distinct({WORDS})) as word"
    )
    # corpus size as a broadcast one-row aggregate folded into the plan —
    # no separate count() action/scan (the oracle's CROSS JOIN n)
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df_counts = words.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    tf = words.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.join(df_counts, "word").crossJoin(F.broadcast(n)).selectExpr(
        "lang", "word", "tf", "df",
        "round(tf * ln(n_docs / df), 4) as tfidf",
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(
        F.col("tfidf").desc(), F.col("word")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("lang", "rank", "word", "tf", "df", "tfidf")
    )


def _tfidf_sql() -> str:
    return f"""
WITH words AS (
  SELECT doc_id, lang, unnest(list_distinct({WORDS_DUCK})) AS word
  FROM documents
), n AS (SELECT count(*) AS n_docs FROM documents),
df_counts AS (
  SELECT word, count(DISTINCT doc_id) AS df FROM words GROUP BY word
), tf AS (
  SELECT lang, word, count(*) AS tf FROM words GROUP BY lang, word
), scored AS (
  SELECT lang, tf.word, tf, df,
         round(tf * ln(n_docs / df::DOUBLE), 4) AS tfidf
  FROM tf JOIN df_counts ON tf.word = df_counts.word CROSS JOIN n
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY tfidf DESC, word) AS rank
  FROM scored
)
SELECT lang, rank, word, tf, df, tfidf FROM ranked WHERE rank <= 5
"""


TFIDF_SQL = _tfidf_sql()


# ---------------------------------------------------------------------------
# PII redaction (training-corpus scrubbing)
# ---------------------------------------------------------------------------

# patterns chosen to mean the same thing in Java regex (Spark) and RE2-ish
# (DuckDB): character classes + bounded quantifiers only, and NO
# backslashes — Spark SQL string literals eat them, DuckDB's don't
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
_PHONE_RE = "[+]?[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}"


def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus scrubbing: count and redact email / phone-shaped spans.
    Pure codegen regexp passes (regexp_count + regexp_replace) — the
    cheapest possible full-corpus rewrite; emits the redacted-text hash
    so the oracle checks the rewrite itself, not just the counts."""
    docs = load(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        f"cast(regexp_count(text, '{_EMAIL_RE}') as bigint) as n_emails",
        f"cast(regexp_count(text, '{_PHONE_RE}') as bigint) as n_phones",
        f"md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]'), "
        f"'{_PHONE_RE}', '[PHONE]')) as redacted_md5",
    )


REDACT_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_EMAIL_RE}'))::BIGINT AS n_emails,
       len(regexp_extract_all(text, '{_PHONE_RE}'))::BIGINT AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
           '{_PHONE_RE}', '[PHONE]', 'g')) AS redacted_md5
FROM documents
"""


# ---------------------------------------------------------------------------
# deterministic train/val/test split (stratified by lang)
# ---------------------------------------------------------------------------

def doc_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split: bucket = shared-60-bit-md5(doc_id) % 100
    → train (<90) / val (<95) / test. Hash-based splits are the only kind
    that survive re-runs and late-arriving shards at corpus scale (random()
    is neither reproducible nor stable under re-partitioning). Output is
    the per-(lang, split) contingency so the oracle checks the exact
    membership function, stratification included."""
    docs = load(spark, sf_dir, "documents")
    h = _h("cast(doc_id as string)")
    return (
        docs.selectExpr(
            "lang",
            f"CASE WHEN {h} % 100 < 90 THEN 'train' "
            f"WHEN {h} % 100 < 95 THEN 'val' ELSE 'test' END as split",
        )
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


TRAIN_SPLIT_SQL = f"""
SELECT lang,
       CASE WHEN {_h_duck('doc_id::VARCHAR')} % 100 < 90 THEN 'train'
            WHEN {_h_duck('doc_id::VARCHAR')} % 100 < 95 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs
FROM documents GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# corpus token histogram (heavy hitters)
# ---------------------------------------------------------------------------

def token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-25 tokens by occurrence. The explode multiplies rows but
    partial aggregation collapses them map-side, so the exchange carries
    (distinct tokens × tasks) rows; the final top-k is a
    TakeOrderedAndProject, never a full sort of the vocabulary."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.selectExpr(f"explode({WORDS}) as word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .orderBy(F.col("occurrences").desc(), "word")
        .limit(25)
    )


TOKEN_HIST_SQL = f"""
SELECT word, count(*) AS occurrences
FROM (SELECT unnest({WORDS_DUCK}) AS word FROM documents)
GROUP BY word
ORDER BY occurrences DESC, word
LIMIT 25
"""


QUERIES = {
    "ngram_jaccard": ngram_jaccard,
    "ngram_jaccard_lsh": ngram_jaccard_lsh,
    "tfidf_top_terms": tfidf_top_terms,
    "text_tokens": text_tokens,
    "text_quality": text_quality,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
    "dedup_exact": dedup_exact,
    "dedup_prefix": dedup_prefix,
    "text_simhash": text_simhash,
    "minhash_lsh_neardup": minhash_lsh_neardup,
    "text_redact_pii": text_redact_pii,
    "doc_train_split": doc_train_split,
    "token_histogram": token_histogram,
}

ORACLES = {
    "ngram_jaccard": NGRAM_JACCARD_SQL,
    "ngram_jaccard_lsh": NGRAM_JACCARD_LSH_SQL,
    "tfidf_top_terms": TFIDF_SQL,
    "text_tokens": TOKENS_SQL,
    "text_quality": QUALITY_SQL,
    "text_langid": LANGID_SQL,
    "text_fingerprint": FINGERPRINT_SQL,
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_prefix": DEDUP_PREFIX_SQL,
    "text_simhash": SIMHASH_SQL,
    "minhash_lsh_neardup": MINHASH_SQL,
    "text_redact_pii": REDACT_SQL,
    "doc_train_split": TRAIN_SPLIT_SQL,
    "token_histogram": TOKEN_HIST_SQL,
}
