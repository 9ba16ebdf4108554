"""Entity-resolution / matching operators (SURVEY §2.3 J5-J6, §2.5 W2)
plus the HTML-structure rule packs (P2, F9) and keyword rule classes.

Top-k similarity joins run as token equi-joins + window trims — the
Catalyst-native form of the reference's RapidFuzz candidate generation
(`competitor_match.py:159-208`): candidate generation is an inverted
token index (hash join), rescoring is column arithmetic, and the trim
is one window. No cross join, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pqc.io import load_table
from pqc.registry import register
from pqc.rule_packs import spark_inline, values_cte

# ---------------------------------------------------------------------------
# Competitor-style top-k similarity join with penalty rescoring (J6)
# ---------------------------------------------------------------------------

TOPK = 8  # competitor_match.py:162 (k=8 default)
WIDEN = max(3 * TOPK, 25)  # :180 "wider net; we'll trim after penalties"
SIZE_PENALTY = 20
BRAND_PENALTY = 15
STRENGTH_PENALTY = 10  # :200-203, p_type as the strength analogue

_COMPETITOR_ORACLE = f"""
WITH q AS (
  SELECT p_partkey AS qkey, p_name AS qname, p_brand AS qbrand,
         p_size AS qsize, p_type AS qcont
  FROM part WHERE p_partkey < 10
),
qt AS (SELECT DISTINCT qkey, unnest(string_split(qname, ' ')) AS tok FROM q),
qn AS (SELECT qkey, COUNT(*) AS n_q FROM qt GROUP BY qkey),
ct AS (SELECT DISTINCT p_partkey AS ckey, unnest(string_split(p_name, ' ')) AS tok
       FROM part),
overlap AS (
  SELECT qt.qkey, ct.ckey, COUNT(*) AS n_common
  FROM qt JOIN ct ON qt.tok = ct.tok
  GROUP BY qt.qkey, ct.ckey
),
raw AS (
  SELECT qkey, ckey, raw_score FROM (
    SELECT o.qkey, o.ckey,
           CAST(o.n_common AS DOUBLE) * 100 / qn.n_q AS raw_score,
           ROW_NUMBER() OVER (
             PARTITION BY o.qkey
             ORDER BY CAST(o.n_common AS DOUBLE) * 100 / qn.n_q DESC, o.ckey ASC
           ) AS rk_raw
    FROM overlap o JOIN qn ON qn.qkey = o.qkey
    WHERE o.qkey <> o.ckey
  ) WHERE rk_raw <= {WIDEN}
),
scored AS (
  SELECT r.qkey, r.ckey,
         r.raw_score
         - (CASE WHEN CAST(LEAST(q.qsize, c.p_size) AS DOUBLE)
                      / GREATEST(q.qsize, c.p_size) < 0.85
                 THEN {SIZE_PENALTY} ELSE 0 END)
         - (CASE WHEN q.qbrand <> c.p_brand THEN {BRAND_PENALTY} ELSE 0 END)
         - (CASE WHEN q.qcont <> c.p_type THEN {STRENGTH_PENALTY} ELSE 0 END)
           AS adj_score
  FROM raw r
  JOIN q ON q.qkey = r.qkey
  JOIN part c ON c.p_partkey = r.ckey
)
SELECT qkey, ckey, ROUND(adj_score, 4) AS adj_score, rk FROM (
  SELECT qkey, ckey, adj_score,
         ROW_NUMBER() OVER (PARTITION BY qkey ORDER BY adj_score DESC, ckey ASC) AS rk
  FROM scored
) WHERE rk <= {TOPK}
"""


@register("competitor_topk_match", oracle=_COMPETITOR_ORACLE)
def competitor_topk_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k similarity join with the reference's full rescoring ladder
    (`competitor_match.py:159-208`): token-overlap raw score
    (inverted-index equi-join, never a cross join), widened to the top
    max(3k, 25)=25 raw candidates per query (`:180`), then penalised —
    size-ratio −20 when min/max < 0.85 (`:189-196`), brand mismatch
    −15 (flavour analogue, `:197-199`), type mismatch −10
    (strength analogue, `:200-203`) — re-ranked on the adjusted score
    and trimmed to k=8 (`:162,207-208`). Candidates are bounded by
    shared tokens — the plan shape that survives 10^12 candidates."""
    part = load_table(spark, sf_dir, "part")
    q = part.filter(F.col("p_partkey") < 10).select(
        F.col("p_partkey").alias("qkey"),
        F.col("p_name").alias("qname"),
        F.col("p_brand").alias("qbrand"),
        F.col("p_size").alias("qsize"),
        F.col("p_type").alias("qcont"),
    )
    qt = q.select(
        "qkey", F.explode(F.array_distinct(F.split("qname", " "))).alias("tok")
    )
    qn = qt.groupBy("qkey").agg(F.count(F.lit(1)).alias("n_q"))
    ct = part.select(
        F.col("p_partkey").alias("ckey"),
        F.explode(F.array_distinct(F.split("p_name", " "))).alias("tok"),
    )
    overlap = (
        qt.join(ct, "tok")
        .groupBy("qkey", "ckey")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("qkey") != F.col("ckey"))
    )
    w_raw = W.partitionBy("qkey").orderBy(
        F.col("raw_score").desc(), F.col("ckey").asc()
    )
    raw = (
        overlap.join(qn, "qkey")
        .withColumn(
            "raw_score", F.col("n_common").cast("double") * 100 / F.col("n_q")
        )
        .withColumn("rk_raw", F.row_number().over(w_raw))
        .filter(F.col("rk_raw") <= WIDEN)
        .select("qkey", "ckey", "raw_score")
    )
    cand = part.select(
        F.col("p_partkey").alias("ckey"),
        F.col("p_brand").alias("cbrand"),
        F.col("p_size").alias("csize"),
        F.col("p_type").alias("ccont"),
    )
    scored = (
        raw.join(F.broadcast(q.select("qkey", "qbrand", "qsize", "qcont")), "qkey")
        .join(cand, "ckey")
        .withColumn(
            "adj_score",
            F.col("raw_score")
            - F.when(
                F.least("qsize", "csize").cast("double") / F.greatest("qsize", "csize")
                < 0.85,
                SIZE_PENALTY,
            ).otherwise(0)
            - F.when(F.col("qbrand") != F.col("cbrand"), BRAND_PENALTY).otherwise(0)
            - F.when(F.col("qcont") != F.col("ccont"), STRENGTH_PENALTY).otherwise(0),
        )
    )
    w = W.partitionBy("qkey").orderBy(F.col("adj_score").desc(), F.col("ckey").asc())
    return (
        scored.select(
            "qkey", "ckey", "adj_score", F.row_number().over(w).alias("rk")
        )
        .filter(F.col("rk") <= TOPK)
        .select("qkey", "ckey", F.round("adj_score", 4).alias("adj_score"), "rk")
    )


# ---------------------------------------------------------------------------
# Green-claims capped per-section ranking (J5 + W2, green_claims.py:51-106)
# ---------------------------------------------------------------------------

_CLAIM_COLS = ["section", "phrase"]
CLAIMS_DIM = [
    ("recyclability", "recyclable"),
    ("recyclability", "recycled content"),
    ("carbon", "carbon neutral"),
    ("carbon", "net zero"),
    ("general", "eco friendly"),
    ("general", "biodegradable"),
    ("general", "sustainably sourced"),
    ("general", "green"),
]
CAP_PER_SECTION = 5

_CLAIMS_ORACLE = f"""
WITH {values_cte(CLAIMS_DIM, _CLAIM_COLS, 'c')},
hits AS (
  SELECT d.doc_id, c.section, c.phrase, length(c.phrase) AS score
  FROM documents d JOIN c ON instr(lower(d.text), c.phrase) > 0
  WHERE d.text IS NOT NULL
)
SELECT doc_id, section, phrase, score, rk FROM (
  SELECT doc_id, section, phrase, score,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id, section
           ORDER BY score DESC, phrase ASC
         ) AS rk
  FROM hits
) WHERE rk <= {CAP_PER_SECTION}
"""


@register("claims_capped_ranking", oracle=_CLAIMS_ORACLE)
def claims_capped_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Green-claims screen: broadcast claim dim probed by substring
    (`screen_candidates` `green_claims.py:51-106`), ranked and capped
    per section (≤5, `:97-105`). Substring probe = broadcast nested
    loop with `instr`; at 10^12 rows the exact screen narrows via the
    token equi-join first (same two-stage shape as text_rules)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    dim = F.broadcast(spark_inline(spark, CLAIMS_DIM, _CLAIM_COLS))
    hits = docs.join(
        dim, F.instr(F.lower(F.col("text")), F.col("phrase")) > 0
    ).select(
        "doc_id", "section", "phrase", F.length("phrase").alias("score")
    )
    w = W.partitionBy("doc_id", "section").orderBy(
        F.col("score").desc(), F.col("phrase").asc()
    )
    return (
        hits.select("doc_id", "section", "phrase", "score", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= CAP_PER_SECTION)
    )


# ---------------------------------------------------------------------------
# HTML strip (P2) + allergen-bold structure check (F9, prompts.py:1825-1884)
# ---------------------------------------------------------------------------

_HTML_COLS = ["row_id", "html"]
HTML_FIXTURE = [
    (1, "Contains <b>milk</b> and <strong>soya</strong>."),
    (2, "Contains milk and <b>wheat</b>."),
    (3, "May contain traces of <i>peanut</i>s."),
    (4, "Ingredients: oats, <b>barley</b> malt, hazelnut paste"),
    (5, "sulphate rich mineral water"),  # sulphite≠sulphate trap
    (6, "<p>Plain   text&nbsp;here</p>"),
    (7, "almond-free recipe with almond flavouring"),
]

ALLERGENS = ("milk", "soya", "wheat", "peanut", "barley", "hazelnut", "sulphite", "almond")

_STRIP_SQL = "trim(regexp_replace(regexp_replace({c}, '<[^>]+>', ' ', 'g'), '[ \\t]+', ' ', 'g'))"

_HTML_STRIP_ORACLE = f"""
WITH {values_cte(HTML_FIXTURE, _HTML_COLS, 'h')}
SELECT row_id, {_STRIP_SQL.format(c='html')} AS stripped FROM h
"""


@register("html_strip", oracle=_HTML_STRIP_ORACLE)
def html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: drop tags, collapse whitespace (`strip_html` `app.py:58-61`)."""
    h = spark_inline(spark, HTML_FIXTURE, _HTML_COLS)
    stripped = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("html"), "<[^>]+>", " "), r"[ \t]+", " "
        )
    )
    return h.select("row_id", stripped.alias("stripped"))


def _bold_residue_sql(col: str) -> str:
    """Drop <b>/<strong> spans, strip other tags, normalize to a
    token-boundary-searchable padded lowercase string."""
    debold = f"regexp_replace({col}, '<(b|strong)>[^<]*</(b|strong)>', ' ', 'g')"
    detag = f"regexp_replace({debold}, '<[^>]+>', ' ', 'g')"
    norm = f"regexp_replace(lower({detag}), '[^a-z0-9]+', ' ', 'g')"
    return f"(' ' || trim({norm}) || ' ')"


_ALLERGEN_LIST_SQL = ", ".join(f"('{a}')" for a in ALLERGENS)

_ALLERGEN_ORACLE = f"""
WITH {values_cte(HTML_FIXTURE, _HTML_COLS, 'h')},
a AS (SELECT * FROM (VALUES {_ALLERGEN_LIST_SQL}) AS _a(allergen)),
residue AS (
  SELECT row_id,
         {_bold_residue_sql('html')} AS res,
         (' ' || trim(regexp_replace(lower(regexp_replace(html, '<[^>]+>', ' ', 'g')),
                                     '[^a-z0-9]+', ' ', 'g')) || ' ') AS full_text
  FROM h
)
SELECT r.row_id, a.allergen
FROM residue r JOIN a
  ON instr(r.res, ' ' || a.allergen || ' ') > 0
WHERE instr(r.full_text, ' may contain ') = 0
"""


@register("allergen_bold_check", oracle=_ALLERGEN_ORACLE)
def allergen_bold_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 (`prompts.py:1851-1884`): an allergen token appearing OUTSIDE
    a <b>/<strong> span is a violation; 'may contain' statements are
    excluded; token-boundary matching via space-padded normalized text
    (so sulphate ≠ sulphite, almond-free still hits 'almond' as its own
    token — exact spelling echoed). Deterministic re-impl: strip bold
    spans → boundary search in the residue."""
    h = spark_inline(spark, HTML_FIXTURE, _HTML_COLS)
    a = F.broadcast(
        spark_inline(spark, [(x,) for x in ALLERGENS], ["allergen"])
    )
    debold = F.regexp_replace(
        F.col("html"), "<(b|strong)>[^<]*</(b|strong)>", " "
    )
    detag = F.regexp_replace(debold, "<[^>]+>", " ")
    norm = F.regexp_replace(F.lower(detag), "[^a-z0-9]+", " ")
    res = F.concat(F.lit(" "), F.trim(norm), F.lit(" "))
    full_norm = F.regexp_replace(
        F.lower(F.regexp_replace(F.col("html"), "<[^>]+>", " ")), "[^a-z0-9]+", " "
    )
    full_text = F.concat(F.lit(" "), F.trim(full_norm), F.lit(" "))
    residue = h.select("row_id", res.alias("res"), full_text.alias("full_text"))
    return (
        residue.join(
            a, F.instr(F.col("res"), F.concat(F.lit(" "), F.col("allergen"), F.lit(" "))) > 0
        )
        .filter(F.instr(F.col("full_text"), " may contain ") == 0)
        .select("row_id", "allergen")
    )


# ---------------------------------------------------------------------------
# Medicinal-language keyword classes (prompts.py:925-961)
# ---------------------------------------------------------------------------

_MED_COLS = ["row_id", "claim"]
MED_FIXTURE = [
    (1, "cures arthritis in weeks"),
    (2, "treats eczema and prevents flare-ups"),
    (3, "supports normal immune function"),
    (4, "contributes to the maintenance of normal bones"),
    (5, "heals wounds fast"),
    (6, "reduces inflammation"),
    (7, "a tasty daily supplement"),
    (8, "clinically proven to relieve pain"),
]

_MED_FLAG = "(cures?|treats?|heals?|prevents?|relieves?|reduces? inflammation|clinically proven)"
_MED_OK = "(supports?|contributes? to|maintenance of) (the )?(normal|)"

_MED_ORACLE = f"""
WITH {values_cte(MED_FIXTURE, _MED_COLS, 'm')}
SELECT row_id, claim,
       regexp_matches(lower(claim), '{_MED_FLAG}')
         AND NOT regexp_matches(lower(claim), '{_MED_OK}') AS flagged
FROM m
"""


@register("medicinal_language_flag", oracle=_MED_ORACLE)
def medicinal_language_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag/no-flag phrase classes (`prompts.py:948-961`): medicinal
    verbs flag, EFSA-style 'supports/contributes to normal …' wording
    does not."""
    m = spark_inline(spark, MED_FIXTURE, _MED_COLS)
    flagged = F.lower(F.col("claim")).rlike(_MED_FLAG) & ~F.lower(
        F.col("claim")
    ).rlike(_MED_OK)
    return m.select("row_id", "claim", flagged.alias("flagged"))


# ---------------------------------------------------------------------------
# Shelf-label validation arithmetic (prompts.py:1016-1060)
# ---------------------------------------------------------------------------

_SEL_COLS = ["row_id", "sel_line1", "sel_line2", "uom", "pack_qty", "reference_qty", "price_mult"]
SEL_FIXTURE = [
    (1, "CHOC BAR", "4 PACK", "100g", 400.0, 100.0, 0.25),
    (2, "ORANGE JUICE SMOOTH", "1L CARTON", "100ml", 1000.0, 100.0, 0.1),
    (3, "THIS LINE IS FAR TOO LONG FOR A SHELF LABEL", "OK", "100g", 200.0, 100.0, 0.5),
    (4, "WIDGET", "BAD UOM", "per furlong", 100.0, 100.0, 1.0),
    (5, "MULT WRONG", "X", "100g", 400.0, 100.0, 0.3),
    (6, "EACH OK", "X", "each", 4.0, 1.0, 0.25),
]
ALLOWED_UOM = ("100g", "100ml", "each", "kg", "l", "unit")
SEL_MAX_CHARS = 20

_SEL_ORACLE = f"""
WITH {values_cte(SEL_FIXTURE, _SEL_COLS, 's')}
SELECT row_id,
       length(sel_line1) <= {SEL_MAX_CHARS} AND length(sel_line2) <= {SEL_MAX_CHARS}
         AS sel_wrap_ok,
       uom IN {str(ALLOWED_UOM)} AS uom_ok,
       ABS(price_mult - reference_qty / pack_qty) <= 0.0001 AS price_mult_ok
FROM s
"""


@register("shelf_label_validation", oracle=_SEL_ORACLE)
def shelf_label_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shelf-label checks (`prompts.py:1016-1060`): SEL 2×20-char wrap
    (`:1042-1043`), allowed UOM set (`:1031-1038`), and
    price_mult = reference_qty ÷ pack_size_qty ± 1e-4 (`:1050-1052`)."""
    s = spark_inline(spark, SEL_FIXTURE, _SEL_COLS)
    return s.select(
        "row_id",
        (
            (F.length("sel_line1") <= SEL_MAX_CHARS)
            & (F.length("sel_line2") <= SEL_MAX_CHARS)
        ).alias("sel_wrap_ok"),
        F.col("uom").isin(*ALLOWED_UOM).alias("uom_ok"),
        (
            F.abs(F.col("price_mult") - F.col("reference_qty") / F.col("pack_qty"))
            <= 0.0001
        ).alias("price_mult_ok"),
    )
