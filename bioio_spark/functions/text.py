"""L4 text-analysis operators over the documents table (SURVEY §2.8).

All operators are pure projections/aggregations of built-in functions —
whole-stage codegen, no UDFs, no shuffle (except noted) — with DuckDB oracle
SQL kept adjacent so semantics stay pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bioio_spark.functions.hashing import MOD, h32_col, h32_sql

# language-id stopword heuristic: small per-language marker sets. The corpus
# is synthetic word salad, so this is a *mechanism* demonstration — the
# contract is engine parity, not linguistic accuracy.
LANG_MARKERS = {
    "en": ["the", "or", "a", "of"],
    "es": ["data", "value", "query"],
    "de": ["group", "window", "batch"],
    "fr": ["merge", "sort", "filter"],
    "zh": ["spark", "hash", "scan"],
}

STOPWORDS = ["the", "a", "or", "of", "and", "to", "in"]

_WS = r"\s+"


def _words(col):
    return F.split(F.trim(col), _WS)


# -- token stats -----------------------------------------------------------

def token_stats(documents: DataFrame) -> DataFrame:
    """Per-document token counts and length stats (narrow projection)."""
    words = _words(F.col("text"))
    nospace = F.regexp_replace("text", _WS, "")
    return (
        documents.select(
            "doc_id",
            F.size(words).alias("n_tokens"),
            F.col("n_chars").alias("n_chars"),
            F.length("text").alias("text_len"),
            F.length(nospace).alias("n_chars_nospace"),
            (F.length(nospace) / F.size(words)).alias("avg_token_len"),
        )
        .orderBy("doc_id")
    )


TOKEN_STATS_ORACLE = r"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
       n_chars,
       length(text) AS text_len,
       length(regexp_replace(text, '\s+', '', 'g')) AS n_chars_nospace,
       length(regexp_replace(text, '\s+', '', 'g'))
         / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)
         AS avg_token_len
FROM documents ORDER BY doc_id
"""


# -- language id -----------------------------------------------------------

def language_id(documents: DataFrame) -> DataFrame:
    """Stopword-marker language scoring with deterministic argmax."""
    words = _words(F.col("text"))
    df = documents.select("doc_id", "lang", words.alias("words"))
    hit_cols = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter("words", lambda w: F.array_contains(arr, w)))
        hit_cols.append(hits.alias(f"hits_{lang}"))
    df = df.select("doc_id", "lang", *hit_cols)
    # deterministic argmax: first language (in declaration order) with the
    # maximal hit count
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit(None).cast("string")
    for lg in reversed(langs):
        pred = F.when(F.col(f"hits_{lg}") == best, F.lit(lg)).otherwise(pred)
    return (
        df.select("doc_id", F.col("lang").alias("labeled_lang"),
                  *[f"hits_{lg}" for lg in langs],
                  pred.alias("predicted_lang"))
        .orderBy("doc_id")
    )


def _langid_oracle() -> str:
    hits = []
    for lang, markers in LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        hits.append(
            f"len(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
            f"w -> list_contains([{lst}], w))) AS hits_{lang}")
    langs = list(LANG_MARKERS)
    greatest = "greatest(" + ", ".join(f"hits_{lg}" for lg in langs) + ")"
    pred = "NULL"
    for lg in reversed(langs):
        pred = f"CASE WHEN hits_{lg} = {greatest} THEN '{lg}' ELSE {pred} END"
    return f"""
    WITH scored AS (
      SELECT doc_id, lang AS labeled_lang, {", ".join(hits)}
      FROM documents
    )
    SELECT doc_id, labeled_lang,
           {", ".join(f"hits_{lg}" for lg in langs)},
           {pred} AS predicted_lang
    FROM scored ORDER BY doc_id
    """


LANGUAGE_ID_ORACLE = _langid_oracle()


# -- quality scoring -------------------------------------------------------

def quality_score(documents: DataFrame) -> DataFrame:
    """Composite quality score: length + stopword ratio + mean token length.

    Filter keeps docs with score >= 0.5 (the "training-data keep" set)."""
    words = _words(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    nospace_len = F.length(F.regexp_replace("text", _WS, ""))
    mean_tok = nospace_len / n_tokens
    length_score = F.least(F.col("n_chars") / F.lit(400.0), F.lit(1.0))
    stop_ratio = n_stop / n_tokens
    tok_score = F.least(mean_tok / F.lit(6.0), F.lit(1.0))
    score = F.round(
        length_score * 0.4 + stop_ratio * 0.3 + tok_score * 0.3, 9)
    # The reported score stays a rounded double, but the >= 0.5 KEEP gate is
    # an exact integer inequality (the float form cross-multiplied by
    # 2400*n_tokens) so the kept set is identical across engine builds.
    nt, ns, nl = (n_tokens.cast("long"), n_stop.cast("long"),
                  nospace_len.cast("long"))
    # gate_margin = 2400*n_tokens*(raw_score - 0.5) as an exact integer;
    # kept iff margin >= 0. Emitted alongside the rounded display score so
    # a consumer can reproduce the keep decision even where the rounded
    # score reads exactly 0.500000000 but the raw score is below 1/2.
    margin = (
        F.lit(24) * nt * F.least(F.col("n_chars").cast("long"), F.lit(400))
        + F.lit(7200) * ns
        + F.lit(1200) * F.least(nl, F.lit(6) * nt)
        - F.lit(12000) * nt
    )
    return (
        documents.filter(margin >= 0)
        .select(
            "doc_id", "lang",
            n_tokens.alias("n_tokens"),
            stop_ratio.alias("stopword_ratio"),
            length_score.alias("length_score"),
            score.alias("quality_score"),
            margin.alias("gate_margin"))
        .orderBy("doc_id")
    )


QUALITY_ORACLE = r"""
WITH scored AS (
  SELECT doc_id, lang,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             w -> list_contains(['the','a','or','of','and','to','in'], w)))
           AS n_stop,
         length(regexp_replace(text, '\s+', '', 'g')) AS nospace_len,
         n_chars
  FROM documents
)
SELECT doc_id, lang, n_tokens,
       n_stop / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
       least(n_chars / 400.0, 1.0) AS length_score,
       round(least(n_chars / 400.0, 1.0) * 0.4
         + (n_stop / CAST(n_tokens AS DOUBLE)) * 0.3
         + least((nospace_len / CAST(n_tokens AS DOUBLE)) / 6.0, 1.0) * 0.3,
         9) AS quality_score,
       24 * CAST(n_tokens AS BIGINT) * least(CAST(n_chars AS BIGINT), 400)
         + 7200 * CAST(n_stop AS BIGINT)
         + 1200 * least(CAST(nospace_len AS BIGINT),
                        6 * CAST(n_tokens AS BIGINT))
         - 12000 * CAST(n_tokens AS BIGINT) AS gate_margin
FROM scored
WHERE 24 * CAST(n_tokens AS BIGINT) * least(CAST(n_chars AS BIGINT), 400)
      + 7200 * CAST(n_stop AS BIGINT)
      + 1200 * least(CAST(nospace_len AS BIGINT),
                     6 * CAST(n_tokens AS BIGINT))
      >= 12000 * CAST(n_tokens AS BIGINT)
ORDER BY doc_id
"""


# -- rolling-hash fingerprint ---------------------------------------------

def rolling_fingerprint(documents: DataFrame) -> DataFrame:
    """Word-level polynomial rolling hash: fp = fold (acc*31 + h32(w)) % M.

    A content fingerprint robust to whitespace normalization; identical
    fold in the oracle via list_reduce with a prepended zero accumulator."""
    words = _words(F.col("text"))
    hashes = F.transform(words, lambda w: h32_col(w))
    fp = F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % F.lit(MOD))
    return (documents.select("doc_id", fp.alias("fingerprint"))
            .orderBy("doc_id"))


FINGERPRINT_ORACLE = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(regexp_split_to_array(trim(text), '\\s+'),
                          w -> {h32_sql('w')})),
         (acc, h) -> (acc * 31 + h) % {MOD}) AS fingerprint
FROM documents ORDER BY doc_id
"""


# -- BPE-ish subword token counting ---------------------------------------

# GPT-2-style pre-tokenizer classes, restricted to RE2-compatible syntax
# (no lookahead) so Spark's Java regex and DuckDB's RE2 match identically:
# optional leading space + (letters | digits | other-non-space run).
_BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_stats(documents: DataFrame) -> DataFrame:
    """Subword-style token counts: the scheduling unit for LLM training-data
    budgets (whitespace words over-count CJK/punct, under-count numbers).
    Pure regexp projection — whole-stage codegen, no shuffle."""
    toks = F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0)
    return (
        documents.select(
            "doc_id",
            F.size(toks).alias("n_bpe_tokens"),
            (F.length("text") / F.size(toks)).alias("chars_per_token"),
        )
        .orderBy("doc_id")
    )


BPE_TOKEN_ORACLE = rf"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS n_bpe_tokens,
       length(text)
         / CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS DOUBLE)
         AS chars_per_token
FROM documents ORDER BY doc_id
"""


# -- repetition filtering (Gopher-style) -----------------------------------

def repetition_filter(documents: DataFrame) -> DataFrame:
    """Within-document repetition metrics (the Gopher quality-rule family,
    Rae et al. 2021 §A1.1: fraction of duplicate words, fraction of
    occurrences claimed by the most common 2-gram) and the keep gate.

    All metrics are EXACT INTEGER counts; the keep decision is integer
    cross-multiplied (dup_words*10 <= n_words*3 AND top2*5 <= n_2grams),
    so the kept set is bit-stable across engines.

    ZERO-SHUFFLE: the most-common-2-gram count is the longest run of the
    SORTED per-doc gram array, computed with the `aggregate` higher-order
    function — a codegen projection. The obvious explode -> groupBy
    (doc_id, gram) formulation shuffles every gram of the corpus; this
    one shuffles nothing (the final orderBy is presentation-only).
    """
    words = _words(F.col("text"))
    base = documents.select(
        "doc_id", "lang",
        F.size(words).alias("n_words"),
        (F.size(words) - F.size(F.array_distinct(words)))
        .alias("dup_words"),
        F.expr("CASE WHEN size(split(trim(text), '\\\\s+')) >= 2 THEN "
               "array_sort(transform("
               "  sequence(0, size(split(trim(text), '\\\\s+')) - 2), "
               "  i -> concat(split(trim(text), '\\\\s+')[i], ' ', "
               "              split(trim(text), '\\\\s+')[i + 1]))) "
               "ELSE array() END").alias("grams"))
    # longest run in the sorted array = max multiplicity
    top2 = F.expr(
        "aggregate(grams, "
        " struct(CAST('' AS STRING) AS prev, CAST(0 AS BIGINT) AS run, "
        "        CAST(0 AS BIGINT) AS best), "
        " (acc, g) -> struct(g AS prev, "
        "   CASE WHEN g = acc.prev THEN acc.run + 1 ELSE CAST(1 AS BIGINT) "
        "   END AS run, "
        "   greatest(acc.best, CASE WHEN g = acc.prev THEN acc.run + 1 "
        "   ELSE CAST(1 AS BIGINT) END) AS best), "
        " acc -> acc.best)")
    return (base.select(
                "doc_id", "lang", "n_words", "dup_words",
                top2.alias("top2_count"),
                F.size("grams").cast("long").alias("n_2grams"))
            .filter((F.col("dup_words") * 10 <= F.col("n_words") * 3)
                    & (F.col("top2_count") * 5 <= F.col("n_2grams")))
            .orderBy("doc_id"))


REPETITION_ORACLE = r"""
WITH w AS (
  SELECT doc_id, lang,
         regexp_split_to_array(trim(text), '\s+') AS words
  FROM documents
), base AS (
  SELECT doc_id, lang, len(words) AS n_words,
         len(words) - len(list_distinct(words)) AS dup_words,
         words
  FROM w
), grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(words)),
                               i -> words[i] || ' ' || words[i + 1]))
           AS gram
  FROM base
), top2 AS (
  SELECT doc_id, max(cnt) AS top2_count, CAST(sum(cnt) AS BIGINT) AS n_2grams
  FROM (SELECT doc_id, gram, count(*) AS cnt
        FROM grams GROUP BY doc_id, gram)
  GROUP BY doc_id
)
SELECT b.doc_id, b.lang, b.n_words, b.dup_words,
       CAST(coalesce(t.top2_count, 0) AS BIGINT) AS top2_count,
       CAST(coalesce(t.n_2grams, 0) AS BIGINT) AS n_2grams
FROM base b LEFT JOIN top2 t USING (doc_id)
WHERE b.dup_words * 10 <= b.n_words * 3
  AND coalesce(t.top2_count, 0) * 5 <= coalesce(t.n_2grams, 0)
ORDER BY b.doc_id
"""


# -- corpus-statistics quality scoring (CCNet-style proxy) -----------------

def word_df_score(documents: DataFrame) -> DataFrame:
    """Common-word-density scoring: the CCNet-style LM-quality proxy with
    the LM replaced by corpus statistics — a word's document frequency
    stands in for its probability, so a doc of corpus-typical words
    scores high and one of rare/garbled tokens scores low.

    Two aggregates: (1) per-word document frequency over distinct
    (doc, word) pairs — partial-combining hash agg on the word key;
    (2) per-doc sum of its distinct words' DFs. ALL-INTEGER outputs
    (df_sum, n_distinct) — the mean-DF ratio is left to the consumer, so
    engine parity is exact. At 100 TB the word-key shuffle is the cost;
    both sides combine map-side and no per-doc state exceeds its
    vocabulary.
    """
    words = _words(F.col("text"))
    doc_words = (documents
                 .select("doc_id",
                         F.explode(F.array_distinct(words)).alias("word")))
    df_of = (doc_words.groupBy("word")
             .agg(F.count(F.lit(1)).alias("df")))
    return (doc_words.join(df_of, "word")
            .groupBy("doc_id")
            .agg(F.sum("df").alias("df_sum"),
                 F.count(F.lit(1)).alias("n_distinct"))
            .orderBy("doc_id"))


WORD_DF_ORACLE = r"""
WITH dw AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(regexp_split_to_array(trim(text), '\s+')))
           AS word
  FROM documents
), dfs AS (
  SELECT word, count(*) AS df FROM dw GROUP BY word
)
SELECT dw.doc_id, CAST(sum(dfs.df) AS BIGINT) AS df_sum,
       count(*) AS n_distinct
FROM dw JOIN dfs USING (word)
GROUP BY dw.doc_id ORDER BY dw.doc_id
"""


# -- line-level (pseudo-paragraph) dedup -----------------------------------

LINE_SEG = 3          # words per pseudo-line (corpus has no newlines)
LINE_DF_MAX = 3       # a line in more docs than this is boilerplate


def line_dedup(documents: DataFrame) -> DataFrame:
    """RefinedWeb/CCNet-style line-level dedup: split each document into
    pseudo-lines (consecutive LINE_SEG-word segments — the fixture corpus
    has no newlines), count each line's document frequency corpus-wide,
    and mark lines shared by more than LINE_DF_MAX docs as boilerplate to
    drop. Returns per-doc integer counts (n_lines, n_dropped, n_kept) so
    engine parity is exact.

    Scale: the only wide ops are the line-key hash aggregate (partial
    map-side combine; key cardinality ~ corpus distinct lines) and the
    join back on the same key — the standard shape of fleet-scale line
    dedup. Segmentation is pure codegen (sequence/transform/slice), no
    Python.
    """
    words = _words(F.col("text"))
    nseg = F.ceil(F.size(words) / F.lit(float(LINE_SEG))).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.array_join(
            F.slice(words, i * LINE_SEG + 1, LINE_SEG), " "))
    base = documents.select("doc_id", segs.alias("lines"))
    doc_lines = base.select("doc_id", F.explode("lines").alias("line"))
    # only the BOILERPLATE set (lines with df > LINE_DF_MAX) joins back —
    # its size is bounded by total_lines / LINE_DF_MAX and shrinks as the
    # threshold grows, so the join side stays small and the optimizer
    # broadcasts it; n_lines needs no second pass (array size, narrow)
    boiler = (doc_lines.distinct()
              .groupBy("line")
              .agg(F.count(F.lit(1)).alias("line_df"))
              .filter(F.col("line_df") > LINE_DF_MAX)
              .select("line"))
    dropped = (doc_lines.join(boiler, "line")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).cast("long").alias("dropped")))
    return (base.select("doc_id",
                        F.size("lines").cast("long").alias("n_lines"))
            .join(dropped, "doc_id", "left")
            .select("doc_id", "n_lines",
                    F.coalesce(F.col("dropped"), F.lit(0)).cast("long")
                    .alias("n_dropped"))
            .withColumn("n_kept", F.col("n_lines") - F.col("n_dropped"))
            .orderBy("doc_id"))


LINE_DEDUP_ORACLE = rf"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
  FROM documents
), segs AS (
  SELECT doc_id,
         unnest(list_transform(
             range(0, CAST(ceil(len(words) / {LINE_SEG}.0) AS INT)),
             i -> array_to_string(
                 list_slice(words, i * {LINE_SEG} + 1,
                            i * {LINE_SEG} + {LINE_SEG}), ' '))) AS line
  FROM w
), df AS (
  SELECT line, count(*) AS line_df
  FROM (SELECT DISTINCT doc_id, line FROM segs) GROUP BY line
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN d.line_df > {LINE_DF_MAX} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped,
       CAST(count(*) - sum(CASE WHEN d.line_df > {LINE_DF_MAX}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM segs s JOIN df d USING (line)
GROUP BY s.doc_id ORDER BY s.doc_id
"""


# -- unigram surprisal quality filter (l4j) ---------------------------------

SURPRISAL_CAP = 44          # tf < 2^44 even at ~10^13 corpus tokens
SURPRISAL_KEEP_MILLI = 35050   # keep iff avg bits/token <= 35.050


def unigram_surprisal(documents: DataFrame,
                      cap: int = SURPRISAL_CAP,
                      keep_milli: int = SURPRISAL_KEEP_MILLI,
                      tf: DataFrame | None = None) -> DataFrame:
    """CCNet-style LM quality filter with the LM replaced by the
    corpus unigram model, made HASH-EXACT by integer bit-length logs:
    a token's surprisal is `cap - floor(log2(tf))` bits, and
    floor(log2(n)) is `length(bin(n)) - 1` — pure integer arithmetic,
    no float log whose last bit could differ across engines. Docs of
    corpus-typical tokens score low (boilerplate-ish), docs of rare or
    garbled tokens score high; the keep gate is the exact integer
    inequality `surprisal_sum * 1000 <= keep_milli * n_tokens` (the
    l4c gate pattern).

    Scale: one occurrence explode (narrow), one partial-combining tf
    aggregate on the word key, one word-keyed join back (both sides
    combine map-side), one per-doc aggregate. No floats anywhere.

    `tf` overrides the corpus term-frequency model with a precomputed
    (word, tf) frame — the streaming twin (s12) builds that model
    incrementally from per-micro-batch partial counts (tf is ADDITIVE,
    so the incrementally-built model equals the one-pass corpus model
    exactly) and probes the same scoring here.

    Returns (doc_id, n_tokens, surprisal_sum, keep) by doc_id."""
    occ = documents.select(
        "doc_id", F.explode(_words(F.col("text"))).alias("word"))
    if tf is None:
        tf = occ.groupBy("word").agg(F.count(F.lit(1)).alias("tf"))
    bits = F.greatest(
        F.lit(0).cast("bigint"),
        F.lit(cap) - (F.length(F.bin("tf")) - F.lit(1)))
    return (occ.join(tf, "word")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
                 F.sum(bits).cast("bigint").alias("surprisal_sum"))
            .withColumn(
                "keep",
                (F.col("surprisal_sum") * 1000
                 <= F.lit(keep_milli) * F.col("n_tokens"))
                .cast("bigint"))
            .orderBy("doc_id"))


SURPRISAL_ORACLE = rf"""
WITH occ AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+'))
           AS word
  FROM documents),
tf AS (SELECT word, count(*) AS tf FROM occ GROUP BY word),
sc AS (
  SELECT occ.doc_id,
         greatest(0, {SURPRISAL_CAP} - (length(bin(tf.tf)) - 1))
           AS bits
  FROM occ JOIN tf USING (word))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(bits) AS BIGINT) AS surprisal_sum,
       CAST(CASE WHEN sum(bits) * 1000
                      <= {SURPRISAL_KEEP_MILLI} * count(*)
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM sc GROUP BY doc_id ORDER BY doc_id
"""


# -- L4m bigram conditional surprisal (CCNet LM filter, order 2) -------------

BIGRAM_KEEP_MILLI = 4560    # keep iff avg conditional bits/bigram <= 4.560


def bigram_surprisal(documents: DataFrame,
                     keep_milli: int = BIGRAM_KEEP_MILLI
                     ) -> DataFrame:
    """CCNet-style LM perplexity filter at order 2: score each document
    by the average CONDITIONAL surprisal of its bigrams under the
    corpus bigram model, `bits(w|prev) = floor(log2 c(prev)) -
    floor(log2 c(prev,w))` — the integer bit-length device of l4j, so
    no float log and no smoothing constant whose representation could
    differ across engines. Documents whose word transitions are
    corpus-typical (low conditional bits) pass the gate; garbled or
    out-of-domain transitions score high.

    Scale shape: bigrams are built INSIDE the row (arrays_zip of two
    slices — no window, no self-join), the model is two chained hash
    aggregates (pair counts, then prev counts as a rollup OF the pair
    counts, so the corpus is scanned once for the model), and scoring
    is one join on the (prev, w) model key — sort-merge at real scale,
    all sides partial-aggregated map-side. Docs with fewer than two
    tokens have no bigram and are excluded by construction.

    Returns (doc_id, n_bigrams, bits_sum, keep) by doc_id; keep is the
    exact integer gate `bits_sum * 1000 <= keep_milli * n_bigrams`."""
    ws = _words(F.col("text"))
    occ = (documents
           .select("doc_id", ws.alias("ws"))
           .filter(F.size("ws") >= 2)
           .select("doc_id",
                   F.explode(F.arrays_zip(
                       F.slice("ws", 1, F.size("ws") - 1).alias("prev"),
                       F.slice("ws", 2, F.size("ws") - 1).alias("w")))
                   .alias("bg"))
           .select("doc_id", F.col("bg")["prev"].alias("prev"),
                   F.col("bg")["w"].alias("w")))
    pair = occ.groupBy("prev", "w").agg(
        F.count(F.lit(1)).alias("c_pair"))
    prevc = pair.groupBy("prev").agg(F.sum("c_pair").alias("c_prev"))
    model = pair.join(prevc, "prev").select(
        "prev", "w",
        ((F.length(F.bin("c_prev")) - F.length(F.bin("c_pair")))
         .cast("bigint").alias("bits")))
    return (occ.join(model, ["prev", "w"])
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
                 F.sum("bits").cast("bigint").alias("bits_sum"))
            .withColumn(
                "keep",
                (F.col("bits_sum") * 1000
                 <= F.lit(keep_milli) * F.col("n_bigrams"))
                .cast("bigint"))
            .orderBy("doc_id"))


BIGRAM_SURPRISAL_ORACLE = rf"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
  FROM documents),
occ AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)),
             i -> struct_pack(prev := ws[i], w := ws[i + 1]))) AS bg
  FROM w WHERE len(ws) >= 2),
bg AS (SELECT doc_id, bg.prev AS prev, bg.w AS w FROM occ),
pair AS (SELECT prev, w, count(*) AS c_pair FROM bg GROUP BY prev, w),
prevc AS (SELECT prev, sum(c_pair) AS c_prev FROM pair GROUP BY prev),
model AS (
  SELECT pair.prev, pair.w,
         length(bin(c_prev)) - length(bin(c_pair)) AS bits
  FROM pair JOIN prevc USING (prev))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(bits) AS BIGINT) AS bits_sum,
       CAST(CASE WHEN sum(bits) * 1000
                      <= {BIGRAM_KEEP_MILLI} * count(*)
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM bg JOIN model USING (prev, w)
GROUP BY doc_id ORDER BY doc_id
"""


# -- L4k DSIR hashed-ngram importance weights --------------------------------

DSIR_BUCKETS = 256
DSIR_TARGET_LANG = "en"


def dsir_weights(documents: DataFrame,
                 n_buckets: int = DSIR_BUCKETS,
                 target_lang: str = DSIR_TARGET_LANG) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169):
    hashed-n-gram importance weights log(p_target(f)/p_source(f))
    summed over each document's features, selecting docs distributed
    like a target domain. Features are word unigrams + bigrams hashed
    into `n_buckets` buckets with the repo's portable h32; the target
    here is the `target_lang` slice of the corpus itself (the
    "select web data to look like Wikipedia" shape with an in-fixture
    target). The log-ratio is made HASH-EXACT by integer bit-length
    logs (the l4j device): lambda(b) = floor(log2(cnt_t(b)+1)) -
    floor(log2(cnt_s(b)+1)), all integers end to end.

    Scale: one feature explode (narrow), two partial-combining
    aggregates onto a HARD-BOUNDED key space (n_buckets rows — the
    entire model is broadcastable by construction, DSIR's point), one
    broadcast remap join, one per-doc aggregate.

    Returns (doc_id, n_feats, weight, keep) by doc_id; keep = 1 iff
    weight >= 0 (doc looks at least as target-like as source-like)."""
    words = _words(F.col("text"))
    base = documents.select("doc_id", "lang", words.alias("ws"))
    nw = F.size("ws")
    uni = base.select(
        "doc_id", "lang", F.explode("ws").alias("f0")).select(
        "doc_id", "lang", F.concat(F.lit("u "), "f0").alias("feat"))
    bi_idx = (F.when(nw >= 2, F.sequence(F.lit(1), nw - 1))
              .otherwise(F.array().cast("array<int>")))
    bi = base.select(
        "doc_id", "lang", "ws", F.explode(bi_idx).alias("i")).select(
        "doc_id", "lang",
        F.concat_ws(" ", F.lit("b"),
                    F.element_at("ws", F.col("i")),
                    F.element_at("ws", F.col("i") + 1)).alias("feat"))
    feats = (uni.unionByName(bi)
             .select("doc_id", "lang",
                     (h32_col(F.col("feat")) % n_buckets).alias("b")))
    # ONE pass builds both densities: cnt_s = all instances, cnt_t =
    # the target-slice instances, same 256-key partial-combining agg
    counts = feats.groupBy("b").agg(
        F.count(F.lit(1)).alias("cnt_s"),
        F.sum(F.when(F.col("lang") == target_lang, 1)
              .otherwise(0)).alias("cnt_t"))

    def lg(col):
        return F.length(F.bin(col)) - F.lit(1)

    lam = counts.select(
        "b",
        (lg(F.col("cnt_t") + F.lit(1))
         - lg(F.col("cnt_s") + F.lit(1)))
        .cast("bigint").alias("lam"))
    return (feats.join(F.broadcast(lam), "b")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_feats"),
                 F.sum("lam").cast("bigint").alias("weight"))
            .withColumn("keep", (F.col("weight") >= 0).cast("bigint"))
            .orderBy("doc_id"))


DSIR_ORACLE = rf"""
WITH w AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS ws
  FROM documents),
uni AS (SELECT doc_id, lang, 'u ' || unnest(ws) AS feat FROM w),
bi AS (
  SELECT w.doc_id, w.lang,
         'b ' || w.ws[t.i] || ' ' || w.ws[t.i + 1] AS feat
  FROM w, unnest(generate_series(1, len(w.ws) - 1)) t(i)
  WHERE len(w.ws) >= 2),
feats AS (
  SELECT doc_id, lang, {h32_sql('feat')} % {DSIR_BUCKETS} AS b
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
counts AS (
  SELECT b, count(*) AS cnt_s,
         sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
           AS cnt_t
  FROM feats GROUP BY b),
lam AS (
  SELECT b,
         CAST((length(bin(cnt_t + 1)) - 1)
              - (length(bin(cnt_s + 1)) - 1) AS BIGINT) AS lam
  FROM counts),
per_doc AS (
  SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         CAST(sum(l.lam) AS BIGINT) AS weight
  FROM feats f JOIN lam l USING (b) GROUP BY f.doc_id)
SELECT doc_id, n_feats, weight,
       CAST(CASE WHEN weight >= 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM per_doc ORDER BY doc_id
"""


# -- L4l TF-IDF top-k similar document pairs ---------------------------------

TFIDF_IDF_CAP = 20              # idf = CAP - floor(log2(df)), floored at 0
TFIDF_MAX_POSTING = 64          # per-word posting-list width cap (l2d)
TFIDF_TOP_PAIRS = 20


def tfidf_similar_pairs(documents: DataFrame,
                        idf_cap: int = TFIDF_IDF_CAP,
                        max_posting: int = TFIDF_MAX_POSTING,
                        top: int = TFIDF_TOP_PAIRS) -> DataFrame:
    """Sparse-vector document similarity: top pairs by the TF-IDF dot
    product — the text-side complement of the dense-embedding l3
    family (same retrieval math, inverted-index shape instead of ANN).
    IDF is the l4j integer device: idf(w) = max(0, cap - floor(
    log2(df))) with floor-log2 = bitlen-1, so every weight and score
    is an exact integer — hash-stable with no float ordering to pin.

    Scale levers, both from the repo's standard kit:
    - stop-words self-prune: df >= 2^cap gives idf 0 and the posting
      drops out BEFORE the pair join (the dominant skew source in an
      inverted index costs nothing);
    - residual hot words hit the l2d posting cap: row_number per word,
      keep-lowest-doc_id, max O(cap^2) pairs per word task.
    Pair scores aggregate with map-side combining on the (a, b) key;
    the final top-k is TakeOrderedAndProject.

    Returns (doc_a, doc_b, score), top `top` by score desc, ids asc."""
    from pyspark.sql import Window

    occ = documents.select(
        "doc_id", F.explode(_words(F.col("text"))).alias("word"))
    tf = (occ.groupBy("doc_id", "word")
          .agg(F.count(F.lit(1)).alias("tf")))
    df_ = (tf.groupBy("word")
           .agg(F.count(F.lit(1)).alias("df")))
    idf = F.greatest(F.lit(0).cast("bigint"),
                     F.lit(idf_cap)
                     - (F.length(F.bin("df")) - F.lit(1)))
    posting = (tf.join(df_, "word")
               .select("word", "doc_id",
                       (F.col("tf") * idf).cast("bigint").alias("w"))
               .filter(F.col("w") > 0))
    capped = (posting.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("word").orderBy("doc_id")))
        .filter(F.col("rn") <= max_posting)
        .drop("rn"))
    a, b = capped.alias("a"), capped.alias("b")
    return (a.join(b, (F.col("a.word") == F.col("b.word"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
            .agg(F.sum(F.col("a.w") * F.col("b.w")).cast("bigint")
                 .alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_a"), F.asc("doc_b"))
            .limit(top))


TFIDF_PAIRS_ORACLE = rf"""
WITH occ AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+'))
           AS word
  FROM documents),
tf AS (SELECT doc_id, word, count(*) AS tf
       FROM occ GROUP BY doc_id, word),
dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
posting AS (
  SELECT tf.word, tf.doc_id,
         CAST(tf.tf * greatest(0, {TFIDF_IDF_CAP}
                - (length(bin(dfreq.df)) - 1)) AS BIGINT) AS w
  FROM tf JOIN dfreq USING (word)
  WHERE tf.tf * greatest(0, {TFIDF_IDF_CAP}
          - (length(bin(dfreq.df)) - 1)) > 0),
capped AS (
  SELECT word, doc_id, w FROM (
    SELECT word, doc_id, w,
           row_number() OVER (PARTITION BY word ORDER BY doc_id)
             AS rn
    FROM posting) WHERE rn <= {TFIDF_MAX_POSTING})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(sum(a.w * b.w) AS BIGINT) AS score
FROM capped a JOIN capped b
  ON a.word = b.word AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
ORDER BY score DESC, doc_a ASC, doc_b ASC LIMIT {TFIDF_TOP_PAIRS}
"""


# -- L16 hashed document embeddings (feature hashing) ------------------------

HASH_EMBED_DIM = 16


def hashed_embeddings(documents: DataFrame,
                      dim: int = HASH_EMBED_DIM) -> DataFrame:
    """Feature-hashing document embeddings (Weinberger et al. 2009,
    "Feature Hashing for Large Scale Multitask Learning"): the
    model-free text -> vector bridge. Each word occurrence lands in
    bucket h32(word) % dim with sign +-1 from the hash's next bit, and
    the document's vector is the signed occurrence count per bucket —
    EXACT INTEGERS end to end (the hashing-trick estimator preserves
    inner products in expectation; integer counts keep the oracle
    hash-exact, no normalization float). Any operator of the
    similarity tier (l3/l12/l14) consumes the result as its embedding
    column.

    Scale: one occurrence explode (narrow), one (doc_id, bucket)
    partial-combining aggregate; the dense row form is a per-doc
    map_from_entries + fixed-width transform, all codegen. Output is
    the ROW form (doc_id, dim_idx, component) — scalar values, one row
    per dimension per doc."""
    occ = documents.select(
        "doc_id", F.explode(_words(F.col("text"))).alias("word"))
    h = h32_col(F.col("word"))
    per = (occ.select(
               "doc_id", (h % dim).alias("bucket"),
               (F.when((h % (2 * dim)) >= dim, -1).otherwise(1))
               .alias("sign"))
           .groupBy("doc_id", "bucket")
           .agg(F.sum("sign").alias("v")))
    dense = (per.groupBy("doc_id")
             .agg(F.map_from_entries(
                 F.collect_list(F.struct("bucket", "v"))).alias("m"))
             .select("doc_id", F.explode(
                 F.transform(
                     F.sequence(F.lit(0), F.lit(dim - 1)),
                     lambda j: F.struct(
                         j.alias("dim_idx"),
                         F.coalesce(F.element_at("m", j), F.lit(0))
                         .cast("bigint").alias("component"))))
                 .alias("e"))
             .select("doc_id", F.col("e")["dim_idx"].alias("dim_idx"),
                     F.col("e")["component"].alias("component")))
    return dense.orderBy("doc_id", "dim_idx")


def _hashed_embeddings_oracle(dim: int = HASH_EMBED_DIM) -> str:
    h = h32_sql("word")
    return f"""
    WITH occ AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+'))
               AS word
      FROM documents),
    per AS (
      SELECT doc_id, {h} % {dim} AS bucket,
             sum(CASE WHEN {h} % {2 * dim} >= {dim} THEN -1 ELSE 1 END)
               AS v
      FROM occ GROUP BY doc_id, {h} % {dim}),
    grid AS (
      SELECT d.doc_id, r.j
      FROM (SELECT DISTINCT doc_id FROM occ) d
      CROSS JOIN range({dim}) r(j))
    SELECT g.doc_id, CAST(g.j AS INT) AS dim_idx,
           CAST(coalesce(p.v, 0) AS BIGINT) AS component
    FROM grid g LEFT JOIN per p
      ON p.doc_id = g.doc_id AND p.bucket = g.j
    ORDER BY g.doc_id, g.j
    """


HASHED_EMBEDDINGS_ORACLE = _hashed_embeddings_oracle()


# -- L17 document chunking (fixed window + stride, clamped tail) -------------

CHUNK_WINDOW = 32
CHUNK_STRIDE = 24     # overlap = window - stride = 8 tokens


def doc_chunks(documents: DataFrame, window: int = CHUNK_WINDOW,
               stride: int = CHUNK_STRIDE) -> DataFrame:
    """The pretraining/RAG chunker: split each document into
    fixed-`window` token chunks every `stride` tokens (overlap =
    window - stride), with the LAST window clamped to end exactly at
    the document tail — every chunk of a long doc is full-width, the
    standard LM-context construction. Docs at or under `window` tokens
    yield one whole-doc chunk.

    Entirely IN-ROW (transform over the start sequence + slice) then
    one explode — no window function, no shuffle before the
    presentation sort. chunk_md5 is the md5 of the space-joined chunk,
    so the oracle hash pins the exact token boundaries, overlap and
    clamping included.

    Returns (doc_id, chunk_idx, start_tok, chunk_len, chunk_md5)."""
    W, S = int(window), int(stride)
    ws = _words(F.col("text"))
    base = documents.select("doc_id", ws.alias("ws"))
    n = F.size("ws")
    # exact integer ceil((n-W)/S) via DIV — the oracle's // twin
    nc = F.when(n <= W, F.lit(1)).otherwise(
        F.expr(f"1 + (size(ws) - {W} + {S} - 1) DIV {S}"))
    chunks = F.transform(
        F.sequence(F.lit(0), nc.cast("int") - 1),
        lambda k: F.struct(
            k.cast("int").alias("ci"),
            F.least(k * S, F.greatest(n - W, F.lit(0)))
            .cast("int").alias("st")))
    ex = (base.select("doc_id", "ws", F.explode(chunks).alias("c"))
          .select("doc_id", "ws",
                  F.col("c")["ci"].alias("chunk_idx"),
                  F.col("c")["st"].alias("start_tok")))
    clen = F.least(F.lit(W), F.size("ws") - F.col("start_tok"))
    return (ex.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("start_tok").cast("bigint").alias("start_tok"),
        clen.cast("bigint").alias("chunk_len"),
        F.md5(F.concat_ws(
            " ", F.slice("ws", F.col("start_tok") + 1, clen)))
        .alias("chunk_md5"))
        .orderBy("doc_id", "chunk_idx"))


def _doc_chunks_oracle(window: int = CHUNK_WINDOW,
                       stride: int = CHUNK_STRIDE) -> str:
    W, S = int(window), int(stride)
    return rf"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
      FROM documents),
    meta AS (
      SELECT doc_id, ws, len(ws) AS n,
             CASE WHEN len(ws) <= {W} THEN 1
                  ELSE 1 + (len(ws) - {W} + {S} - 1) // {S} END AS nc
      FROM w),
    ex AS (
      SELECT doc_id, ws, n,
             unnest(list_transform(range(0, nc),
                 k -> struct_pack(
                     ci := k,
                     st := least(k * {S}, greatest(n - {W}, 0))))) AS c
      FROM meta)
    SELECT doc_id,
           CAST(c.ci AS BIGINT) AS chunk_idx,
           CAST(c.st AS BIGINT) AS start_tok,
           CAST(least({W}, n - c.st) AS BIGINT) AS chunk_len,
           md5(array_to_string(
               list_slice(ws, c.st + 1,
                          c.st + least({W}, n - c.st)), ' '))
             AS chunk_md5
    FROM ex ORDER BY doc_id, chunk_idx
    """


DOC_CHUNKS_ORACLE = _doc_chunks_oracle()
