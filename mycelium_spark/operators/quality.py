"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting — all pure JVM expressions with DuckDB oracle twins.

The langid heuristic scores stopword-profile hits per language and picks
the argmax (ties and all-zero → 'und'); profiles live in
functions/text.py (LANG_PROFILES) and are embedded as literals in both
engines' plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import LANG_PROFILES

_MOD = (1 << 31) - 1
_PUNCT_CLASS = r"[.,;:!?'\"()\-]"
_BPEISH = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def _stop_count_expr(tokens: str, words: tuple[str, ...]) -> str:
    arr = "array(" + ", ".join(f"'{w}'" for w in words) + ")"
    return f"size(filter({tokens}, t -> array_contains({arr}, lower(t))))"


def _stop_count_sql(tokens: str, words: tuple[str, ...]) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({tokens}, t -> list_contains({arr}, lower(t))))"


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language ID → (doc_id, lang_pred)."""
    toks = f"split({text_col}, ' ')"
    df = docs.select(id_col, F.col(text_col))
    for lang in sorted(LANG_PROFILES):
        df = df.withColumn(f"_s_{lang}", F.expr(_stop_count_expr(toks, LANG_PROFILES[lang])))
    # argmax with deterministic ties: first lang (sorted) with score == max > 0
    langs = sorted(LANG_PROFILES)
    best = F.greatest(*[F.col(f"_s_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when((F.col(f"_s_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return df.select(id_col, pred.alias("lang_pred"))


def lang_id_sql() -> str:
    langs = sorted(LANG_PROFILES)
    scores = ", ".join(
        f"{_stop_count_sql('toks', LANG_PROFILES[lang])} AS _s_{lang}" for lang in langs
    )
    best = "greatest(" + ", ".join(f"_s_{lang}" for lang in langs) + ")"
    case = "CASE "
    for lang in langs:
        case += f"WHEN _s_{lang} = {best} AND {best} > 0 THEN '{lang}' "
    case += "ELSE 'und' END"
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, {scores} FROM t)
SELECT doc_id, {case} AS lang_pred FROM s
"""


def quality_features(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword quality features, 6-dp rounded."""
    toks = f"filter(split({text_col}, ' '), t -> t != '')"
    stop = _stop_count_expr(toks, LANG_PROFILES["en"])
    return docs.select(
        id_col,
        F.length(text_col).cast("long").alias("n_chars"),
        F.expr(f"size({toks})").cast("long").alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", "")) / F.length(text_col), 6
        ).alias("alpha_ratio"),
        F.round(
            F.expr(f"length(regexp_replace({text_col}, '[^.,;:!?\\'\"()\\\\-]', ''))")
            / F.length(text_col),
            6,
        ).alias("punct_ratio"),
        F.round(F.expr(stop) / F.expr(f"size({toks})"), 6).alias("stopword_ratio"),
        F.round(
            F.expr(f"aggregate({toks}, 0L, (s, t) -> s + length(t))")
            / F.expr(f"size({toks})"),
            6,
        ).alias("mean_token_len"),
    )


def quality_features_sql() -> str:
    stop = _stop_count_sql("toks", LANG_PROFILES["en"])
    return f"""
WITH t AS (
  SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x != '') AS toks
  FROM documents
)
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text), 6) AS alpha_ratio,
  round(CAST(length(regexp_replace(text, '[^.,;:!?''"()\\-]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
  round(CAST({stop} AS DOUBLE) / len(toks), 6) AS stopword_ratio,
  round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(length(x) AS BIGINT) for x in toks]), (s, x) -> s + x) AS DOUBLE) / len(toks), 6) AS mean_token_len
FROM t
"""


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(whitespace tokens, BPE-ish regex tokens) per doc."""
    return docs.select(
        id_col,
        F.expr(f"size(filter(split({text_col}, ' '), t -> t != ''))")
        .cast("long")
        .alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(_BPEISH), F.lit(0)))
        .cast("long")
        .alias("bpe_tokens"),
    )


def token_counts_sql() -> str:
    return f"""
SELECT doc_id,
  CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '{_BPEISH}')) AS BIGINT) AS bpe_tokens
FROM documents
"""


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive rolling hash (mod 2^31-1) over space tokens —
    md5-derived per-token hashes, so the oracle is bit-exact."""
    h = "CAST(conv(substring(md5(t), 1, 7), 16, 10) AS BIGINT)"
    return docs.select(
        id_col,
        F.expr(
            f"aggregate(transform(split({text_col}, ' '), t -> {h}),"
            f" CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % {_MOD})"
        ).alias("fingerprint"),
    )


def fingerprints_sql() -> str:
    h = "CAST(('0x' || substr(md5(x),1,7)) AS BIGINT)"
    return f"""
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT), [{h} for x in string_split(text, ' ')]),
    (acc, x) -> (acc * 31 + x) % {_MOD}) AS fingerprint
FROM documents
"""


# ------------------------------------------------ Gopher-style filter -----
# Rule set adapted from the published Gopher data pipeline (Rae et al.
# 2021, "Scaling Language Models", Table A1) — the standard web-text
# keep/drop stage. Pure JVM expressions; ratios rounded to 6 dp before
# comparison so both engines decide identically at the boundary.
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep/drop per document with the first failing rule named.

    Returns (doc_id, n_words, keep, fail_reason) where fail_reason is
    NULL for kept documents. Rules are evaluated in a fixed order so the
    reason is deterministic.
    """
    n_words, reason = gopher_reason_cols(
        min_words, max_words, min_mean_word_len, max_mean_word_len,
        max_symbol_ratio, max_bullet_frac, max_ellipsis_line_frac,
        min_alpha_word_frac, min_stop_hits, text_col,
    )
    return docs.select(
        id_col,
        n_words.alias("n_words"),
        reason.isNull().alias("keep"),
        reason.alias("fail_reason"),
    )


def gopher_reason_cols(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
    text_col: str = "text",
):
    """(n_words, first_failing_rule) Columns — pure per-row expressions,
    shared by gopher_rules and the scan-fused clean_gate."""
    toks = f"filter(split({text_col}, ' '), t -> t != '')"
    lines = f"split({text_col}, '\\n')"
    stops = "array(" + ", ".join(f"'{w}'" for w in _GOPHER_STOPS) + ")"
    n_words = F.expr(f"size({toks})").cast("long")
    mean_len = F.round(
        F.expr(f"aggregate({toks}, 0L, (s, t) -> s + length(t))") / n_words, 6
    )
    hashes = F.length(text_col) - F.length(F.expr(f"replace({text_col}, '#', '')"))
    ellipses = (
        F.length(text_col) - F.length(F.expr(f"replace({text_col}, '...', '')"))
    ) / 3
    symbol_ratio = F.round((hashes + ellipses) / n_words, 6)
    bullet_frac = F.round(
        F.expr(
            f"size(filter({lines}, l -> l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%'))"
        )
        / F.expr(f"size({lines})"),
        6,
    )
    ellipsis_line_frac = F.round(
        F.expr(f"size(filter({lines}, l -> l LIKE '%...'))") / F.expr(f"size({lines})"), 6
    )
    alpha_word_frac = F.round(
        F.expr(f"size(filter({toks}, t -> t RLIKE '[A-Za-z]'))") / n_words, 6
    )
    stop_hits = F.expr(f"size(filter({toks}, t -> array_contains({stops}, lower(t))))")
    reason = (
        F.when(n_words < min_words, "too_few_words")
        .when(n_words > max_words, "too_many_words")
        .when(mean_len < min_mean_word_len, "mean_word_len_low")
        .when(mean_len > max_mean_word_len, "mean_word_len_high")
        .when(symbol_ratio > max_symbol_ratio, "symbol_ratio")
        .when(bullet_frac > max_bullet_frac, "bullet_lines")
        .when(ellipsis_line_frac > max_ellipsis_line_frac, "ellipsis_lines")
        .when(alpha_word_frac < min_alpha_word_frac, "non_alpha_words")
        .when(stop_hits < min_stop_hits, "too_few_stopwords")
    )
    return n_words, reason


def gopher_rules_sql(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> str:
    stops = "[" + ", ".join(f"'{w}'" for w in _GOPHER_STOPS) + "]"
    return f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x != '') AS toks,
         string_split(text, chr(10)) AS lines
  FROM documents
), m AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_words,
    round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
          [CAST(length(x) AS BIGINT) for x in toks]), (s, x) -> s + x) AS DOUBLE)
          / len(toks), 6) AS mean_len,
    round((CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
          + (length(text) - length(replace(text, '...', ''))) / 3.0)
          / len(toks), 6) AS symbol_ratio,
    round(CAST(len(list_filter(lines, l -> l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%')) AS DOUBLE)
          / len(lines), 6) AS bullet_frac,
    round(CAST(len(list_filter(lines, l -> l LIKE '%...')) AS DOUBLE)
          / len(lines), 6) AS ellipsis_line_frac,
    round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
          / len(toks), 6) AS alpha_word_frac,
    len(list_filter(toks, x -> list_contains({stops}, lower(x)))) AS stop_hits
  FROM t
)
SELECT doc_id, n_words,
  (CASE WHEN n_words < {min_words} THEN 'too_few_words'
        WHEN n_words > {max_words} THEN 'too_many_words'
        WHEN mean_len < {min_mean_word_len} THEN 'mean_word_len_low'
        WHEN mean_len > {max_mean_word_len} THEN 'mean_word_len_high'
        WHEN symbol_ratio > {max_symbol_ratio} THEN 'symbol_ratio'
        WHEN bullet_frac > {max_bullet_frac} THEN 'bullet_lines'
        WHEN ellipsis_line_frac > {max_ellipsis_line_frac} THEN 'ellipsis_lines'
        WHEN alpha_word_frac < {min_alpha_word_frac} THEN 'non_alpha_words'
        WHEN stop_hits < {min_stop_hits} THEN 'too_few_stopwords'
   END) IS NULL AS keep,
  CASE WHEN n_words < {min_words} THEN 'too_few_words'
       WHEN n_words > {max_words} THEN 'too_many_words'
       WHEN mean_len < {min_mean_word_len} THEN 'mean_word_len_low'
       WHEN mean_len > {max_mean_word_len} THEN 'mean_word_len_high'
       WHEN symbol_ratio > {max_symbol_ratio} THEN 'symbol_ratio'
       WHEN bullet_frac > {max_bullet_frac} THEN 'bullet_lines'
       WHEN ellipsis_line_frac > {max_ellipsis_line_frac} THEN 'ellipsis_lines'
       WHEN alpha_word_frac < {min_alpha_word_frac} THEN 'non_alpha_words'
       WHEN stop_hits < {min_stop_hits} THEN 'too_few_stopwords'
  END AS fail_reason
FROM m
"""


# ------------------------------------------ Gopher repetition rules -------
# The repetition half of Rae et al. 2021 Table A1 (the quality half is
# gopher_rules above): documents dominated by duplicated lines/paragraphs
# or by one hot n-gram are boilerplate. Conventions (mirrored exactly in
# the SQL twin):
# * duplicate fraction counts ALL-BUT-FIRST occurrences
#   (n_items - n_distinct) / n_items — the published replications'
#   convention;
# * duplicate CHARACTER fraction is the same all-but-first convention over
#   item character mass: (sum(len) - sum(len over distinct)) / sum(len);
# * top-n-gram character fraction is max over n-grams of
#   count * charlen(ngram) / charlen(text) — "the n-gram covering the
#   most characters", a deterministic tie-free form of the paper's
#   most-frequent-n-gram coverage;
# * duplicated-n-gram character fraction (n = 5..10) is the UNION of
#   token positions covered by any occurrence of an n-gram that repeats
#   within the document (all occurrences count, overlap counted once),
#   measured in token characters over charlen(text) — the paper's
#   "fraction of characters contained within duplicated n-grams";
# * documents with fewer than n tokens have n-gram fractions 0.
_REP_NS = (2, 3, 4)
_DUP_NS = (5, 6, 7, 8, 9, 10)


def _dup_frac_cols(arr: str) -> tuple:
    """(dup_frac, dup_char_frac) Columns for an array-of-strings expr."""
    n = F.expr(f"size({arr})")
    nd = F.expr(f"size(array_distinct({arr}))")
    ca = F.expr(f"aggregate({arr}, 0L, (s, x) -> s + length(x))")
    cd = F.expr(f"aggregate(array_distinct({arr}), 0L, (s, x) -> s + length(x))")
    dup = F.round((n - nd) / n, 6)
    chars = F.when(ca > 0, F.round((ca - cd) / ca, 6)).otherwise(F.lit(0.0))
    return dup, chars


def repetition_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc repetition metrics → (doc_id, dup_line_frac,
    dup_line_char_frac, dup_para_frac, dup_para_char_frac,
    top{2,3,4}gram_char_frac, dup{5..10}gram_char_frac), all 6-dp
    rounded — the complete repetition column set of Rae et al. Table A1.

    Plan shape: the line/paragraph metrics are pure per-row array
    expressions (no shuffle); each top-n-gram metric is one explode →
    per-(doc, gram) count with map-side combine → per-doc max; each
    dup-n-gram metric rides ONE (doc, gram) window shuffle (the count
    rides the same exchange, the ngram-df-pruning trick) then unions
    covered token positions per doc. Every shuffle is keyed by doc or
    (doc, gram), bounded by document length, never all-pairs.
    """
    lines = f"split({text_col}, '\\n')"
    paras = f"split({text_col}, '\\n\\n')"
    toks = f"filter(split({text_col}, ' '), t -> t != '')"
    line_dup, line_chars = _dup_frac_cols(lines)
    para_dup, para_chars = _dup_frac_cols(paras)
    base = docs.select(
        id_col,
        line_dup.alias("dup_line_frac"),
        line_chars.alias("dup_line_char_frac"),
        para_dup.alias("dup_para_frac"),
        para_chars.alias("dup_para_char_frac"),
    )
    out = base
    for n in _REP_NS:
        ng_arr = (
            f"CASE WHEN size({toks}) >= {n} THEN "
            f"transform(sequence(1, size({toks}) - {n} + 1), "
            f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
            f"ELSE array() END"
        )
        ng = docs.select(
            F.col(id_col),
            F.length(text_col).alias("_tot"),
            F.explode(F.expr(ng_arr)).alias("g"),
        )
        top = (
            ng.groupBy(id_col, "_tot", "g")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy(id_col, "_tot")
            .agg(F.max(F.col("c") * F.length("g")).alias("_cov"))
            .select(
                id_col,
                F.round(F.col("_cov") / F.col("_tot"), 6).alias(
                    f"top{n}gram_char_frac"
                ),
            )
        )
        out = out.join(top, id_col, "left")
    # duplicated-n-gram coverage: positioned grams → window count over
    # (doc, gram) → explode covered positions → distinct union → sum of
    # covered token lengths / charlen(text)
    tok_lens = docs.select(
        F.col(id_col),
        F.posexplode(F.expr(toks)).alias("_p", "_t"),
    ).select(id_col, "_p", F.length("_t").alias("_len"))
    for n in _DUP_NS:
        ng_arr = (
            f"CASE WHEN size({toks}) >= {n} THEN "
            f"transform(sequence(1, size({toks}) - {n} + 1), "
            f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
            f"ELSE array() END"
        )
        pos_ng = docs.select(
            F.col(id_col),
            F.length(text_col).alias("_tot"),
            F.posexplode(F.expr(ng_arr)).alias("_pos", "g"),
        )
        w = Window.partitionBy(id_col, "g")
        hits = (
            pos_ng.withColumn("_c", F.count(F.lit(1)).over(w))
            .filter(F.col("_c") > 1)
            .select(id_col, "_tot", "_pos")
        )
        cov_pos = hits.select(
            id_col, "_tot",
            F.explode(F.sequence(F.col("_pos"), F.col("_pos") + (n - 1))).alias("_p"),
        ).dropDuplicates([id_col, "_p"])
        cov = (
            cov_pos.join(tok_lens, [id_col, "_p"])
            .groupBy(id_col, "_tot")
            .agg(F.sum("_len").alias("_cov"))
            .select(
                id_col,
                F.round(F.col("_cov") / F.col("_tot"), 6).alias(
                    f"dup{n}gram_char_frac"
                ),
            )
        )
        out = out.join(cov, id_col, "left")
    for c in [f"top{n}gram_char_frac" for n in _REP_NS] + [
        f"dup{n}gram_char_frac" for n in _DUP_NS
    ]:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
    return out


def _rep_sql_chars(arr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"[CAST(length(x) AS BIGINT) for x in {arr}]), (s, x) -> s + x)"
    )


def repetition_features_sql(source: str = "documents") -> str:
    """DuckDB twin of repetition_features over ``source`` (any relation
    with doc_id, text)."""
    ng_tops = []
    joins = []
    for n in _REP_NS:
        ng = (
            f"[array_to_string(toks[i+1:i+{n}], ' ') "
            f"for i in range(0, greatest(len(toks) - {n} + 1, 0))]"
        )
        ng_tops.append(
            f"""ng{n} AS (
  SELECT doc_id, length(text) AS tot, unnest({ng}) AS g FROM t
), top{n} AS (
  SELECT doc_id, round(CAST(max(c * length(g)) AS DOUBLE) / tot, 6) AS f
  FROM (SELECT doc_id, tot, g, count(*) AS c FROM ng{n} GROUP BY doc_id, tot, g)
  GROUP BY doc_id, tot
)"""
        )
        joins.append(f"LEFT JOIN top{n} ON base.doc_id = top{n}.doc_id")
    for n in _DUP_NS:
        ng = (
            f"[array_to_string(toks[i+1:i+{n}], ' ') "
            f"for i in range(0, greatest(len(toks) - {n} + 1, 0))]"
        )
        ng_tops.append(
            f"""png{n} AS (
  SELECT doc_id, length(text) AS tot, unnest({ng}) AS g,
         generate_subscripts({ng}, 1) - 1 AS pos
  FROM t
), hits{n} AS (
  SELECT doc_id, tot, pos FROM (
    SELECT doc_id, tot, pos, count(*) OVER (PARTITION BY doc_id, g) AS c
    FROM png{n}
  ) WHERE c > 1
), cov{n} AS (
  SELECT c.doc_id, round(CAST(sum(length(tk.tok)) AS DOUBLE) / any_value(c.tot), 6) AS f
  FROM (SELECT DISTINCT doc_id, tot, unnest(range(pos, pos + {n})) AS p
        FROM hits{n}) c
  JOIN toksp tk ON tk.doc_id = c.doc_id AND tk.p = c.p
  GROUP BY c.doc_id
)"""
        )
        joins.append(f"LEFT JOIN cov{n} ON base.doc_id = cov{n}.doc_id")

    def dup(arr):
        chars = _rep_sql_chars(arr)
        chars_d = _rep_sql_chars(f"list_distinct({arr})")
        return (
            f"round(CAST(len({arr}) - len(list_distinct({arr})) AS DOUBLE) / len({arr}), 6)",
            f"CASE WHEN {chars} > 0 THEN round(CAST({chars} - {chars_d} AS DOUBLE) / {chars}, 6) ELSE 0.0 END",
        )

    ld, lc = dup("lines")
    pd_, pc = dup("paras")
    tops = ",\n".join(ng_tops)
    sel_tops = ", ".join(
        [f"coalesce(top{n}.f, 0.0) AS top{n}gram_char_frac" for n in _REP_NS]
        + [f"coalesce(cov{n}.f, 0.0) AS dup{n}gram_char_frac" for n in _DUP_NS]
    )
    return f"""
WITH t AS (
  SELECT doc_id, text,
         string_split(text, chr(10)) AS lines,
         string_split(text, chr(10) || chr(10)) AS paras,
         list_filter(string_split(text, ' '), x -> x != '') AS toks
  FROM {source}
), toksp AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) - 1 AS p
  FROM t
), base AS (
  SELECT doc_id,
         {ld} AS dup_line_frac,
         {lc} AS dup_line_char_frac,
         {pd_} AS dup_para_frac,
         {pc} AS dup_para_char_frac
  FROM t
),
{tops}
SELECT base.doc_id, dup_line_frac, dup_line_char_frac, dup_para_frac,
       dup_para_char_frac, {sel_tops}
FROM base {' '.join(joins)}
"""


# Table A1 thresholds (Rae et al. 2021)
_REP_THRESHOLDS = (
    ("dup_line_frac", 0.30, "dup_lines"),
    ("dup_para_frac", 0.30, "dup_paras"),
    ("dup_line_char_frac", 0.20, "dup_line_chars"),
    ("dup_para_char_frac", 0.20, "dup_para_chars"),
    ("top2gram_char_frac", 0.20, "top_2gram"),
    ("top3gram_char_frac", 0.18, "top_3gram"),
    ("top4gram_char_frac", 0.16, "top_4gram"),
    ("dup5gram_char_frac", 0.15, "dup_5gram"),
    ("dup6gram_char_frac", 0.14, "dup_6gram"),
    ("dup7gram_char_frac", 0.13, "dup_7gram"),
    ("dup8gram_char_frac", 0.12, "dup_8gram"),
    ("dup9gram_char_frac", 0.11, "dup_9gram"),
    ("dup10gram_char_frac", 0.10, "dup_10gram"),
)


def repetition_filter(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep/drop on the Table A1 repetition thresholds, first failing rule
    named — the companion of gopher_rules (quality half)."""
    feats = repetition_features(docs, text_col, id_col)
    reason = None
    for col, thr, name in _REP_THRESHOLDS:
        cond = F.when(F.col(col) > thr, F.lit(name))
        reason = cond if reason is None else reason.when(F.col(col) > thr, F.lit(name))
    return feats.select(
        id_col, reason.isNull().alias("keep"), reason.alias("fail_reason")
    )


def repetition_filter_sql(source: str = "documents") -> str:
    case = "CASE " + " ".join(
        f"WHEN {col} > {thr} THEN '{name}'" for col, thr, name in _REP_THRESHOLDS
    ) + " END"
    return f"""
WITH feats AS ({repetition_features_sql(source)})
SELECT doc_id, ({case}) IS NULL AS keep, {case} AS fail_reason
FROM feats
"""


_THR = {col: thr for col, thr, _ in _REP_THRESHOLDS}


def clean_gate(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Survivors (doc_id, text) of gopher_rules ∧ repetition_filter with a
    scan-shared staged plan: every PER-ROW rule — all nine Gopher quality
    rules plus the four dup-line/para repetition thresholds — evaluates in
    ONE projection over ONE scan of the corpus, and only its survivors
    feed the nine n-gram stages (each an explode + keyed agg), which read
    the survivor set from a lineage-truncating localCheckpoint instead of
    re-scanning and re-splitting the source per stage.

    Identical keep set to joining the two filters: every rule is an AND'd
    threshold on a per-doc metric, so evaluating the cheap per-row rules
    first changes only the work, never the result. At corpus scale this
    halves-or-better the n-gram explode mass (the per-row rules are the
    most selective) and turns ~11 source scans into one.
    """
    lines = f"split({text_col}, '\\n')"
    paras = f"split({text_col}, '\\n\\n')"
    _, reason = gopher_reason_cols(text_col=text_col)
    line_dup, line_chars = _dup_frac_cols(lines)
    para_dup, para_chars = _dup_frac_cols(paras)
    base = (
        docs.select(id_col, text_col)
        .filter(
            reason.isNull()
            & (line_dup <= _THR["dup_line_frac"])
            & (line_chars <= _THR["dup_line_char_frac"])
            & (para_dup <= _THR["dup_para_frac"])
            & (para_chars <= _THR["dup_para_char_frac"])
        )
        .localCheckpoint(eager=False)
    )
    rep_keep = repetition_filter(base, text_col, id_col).filter("keep").select(id_col)
    # checkpoint the OUTPUT too: consumers reference the survivor set
    # several times (decontamination touches it twice, the span stage
    # once) and without truncation each reference re-runs the nine
    # n-gram towers — ~3x the gate's cost for identical rows
    return base.join(rep_keep, id_col).localCheckpoint(eager=False)


# ------------------------------------------------ C4-style filters --------
# The line/document cleaning rules of C4 (Raffel et al. 2020, "Exploring
# the Limits of Transfer Learning", §2.2) — the other canonical web-text
# cleaning convention alongside the Gopher rules. Conventions (mirrored
# exactly in the SQL twin):
# * a line is RETAINED iff it ends in a terminal punctuation mark
#   (. ! ? or closing double-quote), contains at least 5 whitespace
#   words, and does not contain the word "javascript" (case-insensitive);
# * the DOCUMENT is dropped if the original text contains "{" (code
#   placeholder), contains "lorem ipsum" (case-insensitive), or the
#   line-cleaned text has fewer than 3 sentences — sentence count is the
#   number of [.!?] characters in the cleaned text (a deterministic
#   stand-in for the paper's sentence tokenizer);
# * first failing rule is named, gopher_rules-style: curly_brace →
#   lorem_ipsum → too_few_sentences.
# Everything is a per-row JVM expression: no shuffle, trivially
# partition-parallel at any corpus size.
_C4_LINE_KEEP = (
    "l -> l rlike '[.!?\"]$' "
    "AND size(filter(split(l, ' '), t -> t != '')) >= 5 "
    "AND NOT lower(l) LIKE '%javascript%'"
)


def c4_filters(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (doc_id, keep, fail_reason, clean_text, n_lines, n_lines_kept)."""
    lines = f"split({text_col}, '\\n')"
    kept = f"filter({lines}, {_C4_LINE_KEEP})"
    clean = f"array_join({kept}, '\\n')"
    n_sent = F.expr(f"length({clean}) - length(regexp_replace({clean}, '[.!?]', ''))")
    reason = (
        F.when(F.col(text_col).contains("{"), "curly_brace")
        .when(F.lower(F.col(text_col)).contains("lorem ipsum"), "lorem_ipsum")
        .when(n_sent < 3, "too_few_sentences")
    )
    return docs.select(
        id_col,
        reason.isNull().alias("keep"),
        reason.alias("fail_reason"),
        F.expr(clean).alias("clean_text"),
        F.expr(f"size({lines})").cast("long").alias("n_lines"),
        F.expr(f"size({kept})").cast("long").alias("n_lines_kept"),
    )


def c4_filters_sql(source: str = "documents") -> str:
    line_keep = (
        "l -> regexp_matches(l, '[.!?\"]$') "
        "AND len(list_filter(string_split(l, ' '), t -> t != '')) >= 5 "
        "AND NOT contains(lower(l), 'javascript')"
    )
    return f"""
WITH t AS (
  SELECT doc_id, text,
         string_split(text, chr(10)) AS lines,
         list_filter(string_split(text, chr(10)), {line_keep}) AS kept
  FROM {source}
), c AS (
  SELECT doc_id, text, lines, kept,
         -- array_to_string([]) is NULL in DuckDB; Spark's array_join is ''
         coalesce(array_to_string(kept, chr(10)), '') AS clean_text
  FROM t
), r AS (
  SELECT doc_id, clean_text, lines, kept,
         CASE WHEN contains(text, '{{') THEN 'curly_brace'
              WHEN contains(lower(text), 'lorem ipsum') THEN 'lorem_ipsum'
              WHEN length(clean_text) - length(regexp_replace(clean_text, '[.!?]', '', 'g')) < 3
                THEN 'too_few_sentences'
         END AS fail_reason
  FROM c
)
SELECT doc_id, fail_reason IS NULL AS keep, fail_reason, clean_text,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_lines_kept
FROM r
"""
