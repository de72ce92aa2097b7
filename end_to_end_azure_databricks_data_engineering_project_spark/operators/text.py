"""Text analysis for LLM training-data pipelines: tokenization counts,
quality scoring, language identification, fingerprinting.

All pure-Column expressions (codegen'd, no Python UDFs in the hot path)
— at 100 TB these run inside the parquet scan stage with zero extra
shuffles. Each has an exact ANSI-SQL oracle equivalent (see
plans/queries.py) so correctness is machine-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.functions.scalars import fingerprint
from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import tokens

# Tiny per-language stopword marker sets for n-gram-free heuristic lang-id.
# Word-boundary hits are counted per language; argmax wins. Deliberately
# simple + deterministic (the container has no langid libs).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "is"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "fr": ("le", "la", "les", "et", "des", "une"),
    "de": ("der", "die", "und", "das", "ein", "nicht"),
    "zh": ("的", "是", "了", "在", "我", "有"),
}


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank → 0."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", 0).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("int")


def word_token_count(text: Column) -> Column:
    """BPE-ish token proxy: count word chunks + standalone punctuation
    (regexp extraction of `\\w+|[^\\w\\s]`)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\w+|[^\w\s]"), 0)).cast("int")


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    n = F.length(text)
    p = n - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n.cast("double"))


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    """Fraction of whitespace tokens that are (lowercase) stopwords."""
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    total = token_count(text)
    return F.when(total == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / total.cast("double")
    )


def mean_word_length(text: Column) -> Column:
    toks = F.split(F.trim(text), r"\s+")
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    n = token_count(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(total.cast("double") / n.cast("double"))


def quality_score(text: Column) -> Column:
    """Composite heuristic quality in [0,1]: length band + low punctuation
    + sane mean word length. Mirrors common pretraining-data filters
    (C4/Gopher-style length & symbol heuristics) with exact SQL parity."""
    n_tok = token_count(text)
    length_ok = F.when((n_tok >= 5) & (n_tok <= 5000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) <= 0.2, 1.0).otherwise(0.0)
    mwl = mean_word_length(text)
    word_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.0)
    return ((length_ok + punct_ok + word_ok) / F.lit(3.0)).cast("double")


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    # nb: HOF lambdas must take exactly the Column params — capture
    # `markers` by closure, never by default-arg (arity is inspected)
    def pred(t: Column) -> Column:
        return t.isin(*markers)

    return F.size(F.filter(toks, pred))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit counts over whitespace tokens."""
    toks = tokens(text)
    return {
        lang: _marker_hits(toks, markers) for lang, markers in LANG_MARKERS.items()
    }


def detect_language(text: Column) -> Column:
    """Argmax language with deterministic tie-break (alphabetical), 'und'
    when no marker hits. For zh (no whitespace), falls back to CJK-char
    presence."""
    scores = lang_scores(text)
    cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    scores = dict(scores)
    scores["zh"] = scores["zh"] + cjk
    # Deterministic argmax via array_position(ss, array_max(ss)) —
    # first occurrence = alphabetically-first language on ties, 'und'
    # unless some score is strictly positive. Linear expression size:
    # a when(s > best, ...) running-argmax chain doubles the tree per
    # language (the accumulator appears in both branches), 2^L copies
    # of every marker-hit subexpression.
    langs = sorted(scores)
    ss = F.array(*[scores[lang] for lang in langs])
    mx = F.array_max(ss)
    pick = F.element_at(
        F.array(*[F.lit(lang) for lang in langs]), F.array_position(ss, mx).cast("int")
    )
    return F.when(mx > 0, pick).otherwise(F.lit("und"))


# Default PII patterns: phone-like digit groups, email addresses, IPv4.
# Java regex (Spark) and RE2-ish (DuckDB) agree on this subset — keep
# patterns free of lookarounds/backrefs so both engines match identically.
PII_PATTERNS: dict[str, str] = {
    "PHONE": r"\b\d{3}-\d{3}-\d{4}\b",
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "IP": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact(text: Column, patterns: dict[str, str] = PII_PATTERNS) -> Column:
    """Replace every match of each pattern with its [TAG]. Pure
    regexp_replace chain — codegen'd, zero shuffles, scan-stage work at
    100 TB. Patterns apply in sorted-tag order for determinism."""
    out = text
    for tag in sorted(patterns):
        out = F.regexp_replace(out, patterns[tag], f"[{tag}]")
    return out


def redaction_count(text: Column, patterns: dict[str, str] = PII_PATTERNS) -> Column:
    """Total matches across patterns (pre-redaction, per pattern
    independently — overlapping tags count once per pattern)."""
    total = F.lit(0)
    for tag in sorted(patterns):
        total = total + F.size(F.regexp_extract_all(text, F.lit(patterns[tag]), 0))
    return total.cast("int")


# HTML entities decoded by strip_html, in application order (&amp;
# LAST so '&amp;lt;' decodes to the literal '&lt;', not to '<').
_HTML_ENTITIES = (
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
)


def strip_html(text: Column) -> Column:
    """Boilerplate-strip an HTML payload to visible text (the crawl →
    training-text extraction step): drop <script>/<style> blocks and
    HTML comments wholesale, replace every remaining tag with a space
    (block boundaries must not glue words), decode the six common
    entities, collapse whitespace, trim.

    Pure native regexp/replace expressions — one scan-stage projection,
    no UDF, no shuffle. Patterns stay inside the RE2-compatible subset
    (no backreferences, explicit (?is) flags) so an external engine can
    replay the exact transform — the DuckDB oracle for the
    html_boilerplate_strip catalog entry does, byte-for-byte. Real
    readability extraction (trafilatura-class DOM scoring) needs an
    HTML parser library; this is the deterministic streaming-safe core
    that handles machine-generated boilerplate."""
    out = F.regexp_replace(text, r"(?is)<script[^>]*>.*?</script>", " ")
    out = F.regexp_replace(out, r"(?is)<style[^>]*>.*?</style>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"<[^>]+>", " ")
    for ent, ch in _HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 40,
    stride: int = 30,
) -> DataFrame:
    """Split each document into overlapping whitespace-token windows
    (training-sample chunking). Emits (id, chunk_idx, n_tokens,
    chunk_text). Pure array ops: split → sequence of window starts →
    explode → slice → array_join; no Python UDF, chunking runs in the
    scan stage and only the (much smaller) chunk rows ever shuffle.

    Stride < chunk_size gives overlap; the final window is the last
    start position < token count (short tail windows are kept, matching
    common LLM pack-and-truncate loaders)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("_n") - 1, F.lit(0)), F.lit(stride)
    )
    out = (
        # blank/NULL docs: split('') is [''] (one empty token), which
        # would emit a bogus (n_tokens=1, chunk_text='') training sample
        df.filter(F.trim(F.coalesce(F.col(text_col), F.lit(""))) != "")
        .select(F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n"))
        .select(
            id_col,
            "_toks",
            F.explode(F.filter(starts, lambda s: s < F.col("_n"))).alias("_start"),
        )
        .select(
            id_col,
            (F.col("_start") / stride).cast("int").alias("chunk_idx"),
            F.slice(F.col("_toks"), F.col("_start") + 1, chunk_size).alias("_chunk"),
        )
    )
    return out.select(
        id_col,
        "chunk_idx",
        F.size("_chunk").cast("int").alias("n_tokens"),
        F.array_join("_chunk", " ").alias("chunk_text"),
    )


def with_text_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach the full metric set."""
    t = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(t))
        .withColumn("punct_ratio", punct_ratio(t))
        .withColumn("stopword_ratio", stopword_ratio(t))
        .withColumn("mean_word_len", mean_word_length(t))
        .withColumn("quality", quality_score(t))
        .withColumn("lang_pred", detect_language(t))
        .withColumn("fingerprint", fingerprint(t))
    )


def rule_filter_report(docs: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Gopher/CCNet-style filter report: ONE aggregate pass over the
    corpus computing, for each named rule, how many documents it would
    drop, plus ``kept`` = documents failing no rule. Rules are boolean
    fail-Columns; rows come back as (rule, n_docs).

    Scale shape: a single scan with map-side partial aggregation into
    one driver row (k rule counters), then a stack() unpivot — the
    per-rule bookkeeping costs nothing extra at 100 TB because every
    rule rides the same pass."""
    names = list(rules)
    if not names:
        raise ValueError("rule_filter_report needs at least one rule")
    for n in names:
        if n == "kept" or not n.isidentifier():
            raise ValueError(
                f"rule name {n!r} must be a bare identifier and not the "
                "reserved name 'kept' (names are spliced into stack())"
            )
    # NULL-safe: a rule evaluating to NULL (three-valued logic on a NULL
    # metric) counts as FAILING — the house rule gopher_rules documents
    # for missing_lang_marker, enforced here for every rule so per-rule
    # counts + kept always reconcile with the corpus total. Sums coalesce
    # to 0 so an empty corpus reports zeros, not NULLs.
    safe = {n: F.coalesce(rules[n], F.lit(True)) for n in names}
    aggs = [
        F.coalesce(F.sum(F.when(safe[n], 1).otherwise(0)), F.lit(0))
        .cast("bigint").alias(n)
        for n in names
    ]
    fail_any = None
    for c in safe.values():
        fail_any = c if fail_any is None else (fail_any | c)
    aggs.append(
        F.coalesce(F.sum(F.when(~fail_any, 1).otherwise(0)), F.lit(0))
        .cast("bigint").alias("kept")
    )
    wide = docs.agg(*aggs)
    stack = ", ".join(f"'{n}', {n}" for n in [*names, "kept"])
    return wide.selectExpr(
        f"stack({len(names) + 1}, {stack}) AS (rule, n_docs)"
    )


def gopher_rules(
    text: Column, lang: Column, min_tokens: int = 25,
    mwl_lo: float = 4.0, mwl_hi: float = 5.0,
) -> dict[str, Column]:
    """Three corpus-adapted Gopher-style drop rules: token-count floor,
    mean-word-length band, and a language-consistency check (the text
    must contain at least one marker token of its TAGGED language —
    the lang-aware variant of Gopher's 'must contain a stop word').

    zh marker check also accepts ANY CJK character in the raw text:
    real Chinese is unsegmented, so its single-char markers never
    appear as whitespace tokens — without the fallback essentially
    every genuine zh document would flag missing_lang_marker (the
    same no-whitespace fallback detect_language already has)."""
    toks = tokens(text)
    marker_hit = None
    for lg, markers in LANG_MARKERS.items():
        hit = F.exists(toks, lambda t: t.isin(*markers))
        if lg == "zh":
            hit = hit | F.trim(text).rlike("[\u4e00-\u9fff]")
        branch = (lang == lg) & hit
        marker_hit = branch if marker_hit is None else (marker_hit | branch)
    mwl = mean_word_length(text)
    return {
        "too_few_tokens": token_count(text) < min_tokens,
        "mean_word_len_out_of_band": (mwl < mwl_lo) | (mwl > mwl_hi),
        # coalesce: an unknown/NULL lang makes every branch NULL — the
        # rule must FAIL it (matching the oracle's CASE ... ELSE FALSE),
        # not let three-valued logic drop it from both counters.
        "missing_lang_marker": ~F.coalesce(marker_hit, F.lit(False)),
    }


def cooccurrence_lift(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 30,
    min_co: int = 5,
) -> DataFrame:
    """PMI-style token co-occurrence over the corpus, restricted to the
    ``top_n`` tokens by document frequency. Columns: ``token_a``,
    ``token_b``, ``n_co``, ``lift`` where lift = N·c_ab / (c_a·c_b)
    (the PMI ratio without the log — a single multiply + divide, so the
    double is bit-identical across engines; take log() downstream if
    you want nats).

    Scale posture: the heavy-hitter prefilter IS the design — the
    doc×token explode is pruned to ``top_n`` tokens by a broadcast
    semi-join before any pairing, so the per-doc pair fan-out is
    ≤ C(top_n, 2), independent of vocabulary size, and the pair count
    aggregation is one shuffle on (token_a, token_b). The corpus-wide
    doc count rides a 1-row broadcast (same idiom as tf-idf), never a
    driver collect.
    """
    dt = (
        docs.select(F.col(id_col).alias("_doc"), tokens(F.col(text_col)).alias("_toks"))
        .select("_doc", F.explode(F.array_distinct("_toks")).alias("token"))
    )
    dfreq = dt.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    top = dfreq.orderBy(F.col("df").desc(), F.col("token").asc()).limit(top_n)
    ft = dt.join(F.broadcast(top), "token")
    a, b = ft.alias("a"), ft.alias("b")
    co = (
        a.join(b, F.col("a._doc") == F.col("b._doc"))
        .filter(F.col("a.token") < F.col("b.token"))
        .groupBy(
            F.col("a.token").alias("token_a"),
            F.col("b.token").alias("token_b"),
            F.col("a.df").alias("df_a"),
            F.col("b.df").alias("df_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= min_co)
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    return co.crossJoin(F.broadcast(n_docs)).select(
        "token_a",
        "token_b",
        "n_co",
        # df product in DOUBLE: the int64 product overflows past ~3e9
        # doc frequency (ANSI abort / silent wrap); exact-int doubles
        # multiply bit-identically below 2^53 so the oracle still matches
        (
            F.col("_n").cast("double") * F.col("n_co")
            / (F.col("df_a").cast("double") * F.col("df_b"))
        ).alias("lift"),
    )


def divergent_tokens(
    docs: DataFrame,
    in_a: Column,
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """Top-k most distribution-divergent tokens between two corpus
    slices (``in_a`` true vs false), ranked by the token's two-sample
    chi-square contribution — the drift detector a curation pipeline
    runs when a new crawl/source lands: which tokens changed frequency
    the most relative to the incumbent corpus?

    Per-token statistic (pooled-expectation chi-square term):

        term = (c_a·N_b − c_b·N_a)² · (N_a + N_b) / (N_a·N_b·(c_a+c_b))

    There is NO global float reduction — the output is the ranked
    per-token report (rank on the per-row double + token tiebreak),
    which sidesteps the cross-engine float-sum-ordering problem
    entirely AND is the more actionable artifact (a single scalar chi²
    says "drifted", the token report says *what* drifted). No ln/log
    anywhere (house rule — KL would need one); every input to the
    float expression is an exact integer and the expression tree is
    fixed, so the doubles are bit-identical on any engine.

    Scale shape: one corpus scan → map-side-combinable (token, slice)
    count onto the vocab relation; totals are a 1-row broadcast; the
    ranking sorts the VOCAB (Heaps-law sublinear), never the stream.
    Rows with NULL slice membership are excluded.
    """
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import tokens as _tok

    toks = (
        docs.filter(in_a.isNotNull())
        .filter(F.trim(F.col(text_col)) != "")
        .select(in_a.alias("_a"), F.explode(_tok(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
    )
    counts = toks.groupBy("token").agg(
        F.sum(F.when(F.col("_a"), 1).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("_a"), 0).otherwise(1)).alias("c_b"),
    )
    # Totals ride an unbounded window over the COUNTS relation rather
    # than a separate aggregate: a second aggregate branch would
    # recompute the token counts — i.e. scan the corpus TWICE (caught
    # by test_round9_single_corpus_scan). The window collapses to one
    # partition, but over the vocab relation only — the same bounded
    # cost class as the final row_number ranking below.
    wt = Window.partitionBy()
    counts = counts.withColumn("n_a", F.sum("c_a").over(wt)).withColumn(
        "n_b", F.sum("c_b").over(wt)
    )
    scored = counts.select(
        "token",
        "c_a",
        "c_b",
        # one-slice-empty input → the statistic is undefined → NULL on
        # BOTH engines (unguarded: ANSI Spark throws DIVIDE_BY_ZERO,
        # DuckDB returns inf — the auc_from_bins rule)
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            (
                (
                    F.col("c_a").cast("double") * F.col("n_b").cast("double")
                    - F.col("c_b").cast("double") * F.col("n_a").cast("double")
                )
                * (
                    F.col("c_a").cast("double") * F.col("n_b").cast("double")
                    - F.col("c_b").cast("double") * F.col("n_a").cast("double")
                )
                * (F.col("n_a") + F.col("n_b")).cast("double")
            )
            / (
                (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
                * (F.col("c_a") + F.col("c_b")).cast("double")
            )
        ).alias("chi2_term"),
    )
    w = Window.orderBy(F.col("chi2_term").desc_nulls_last(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(F.col("rank").cast("int").alias("rank"), "token", "c_a", "c_b", "chi2_term")
    )
