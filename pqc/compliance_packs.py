"""Compliance packs grafted from the reference's remaining
deterministic prompt tables (SURVEY §2.9, VERDICT r1 gaps):

- PMO Schedule-1 category classify (`prompts.py:1410-1452`): keyword →
  category → unit-price basis, first-match-wins broadcast map.
- Methylated-vitamin synonym membership (`prompts.py:1577-1592`): the
  two accepted synonym groups, matched case/punctuation/HTML/®™-blind.
- Novel-food screen (`novel_check_utils.py:78-117`): normalize →
  segment on [;,] → exact-substring (score 100) → fuzzy levenshtein
  ratio ≥ threshold (default 87 per `app.py:454-456`), best score per
  canonical. The threshold is a real parameter of the Python API.

Everything is Catalyst expressions probing broadcast VALUES dims; the
DuckDB oracles mirror each pipeline exactly (RE2-safe: no lookarounds).
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pqc.registry import register
from pqc.rule_packs import spark_inline, values_cte
from pqc.text import word_grams, word_grams_sql

# ---------------------------------------------------------------------------
# PMO Schedule-1 category (prompts.py:1410-1452)
# ---------------------------------------------------------------------------

# (keyword, category, unit) — dim order IS the match priority, so
# multi-word specialisations precede their generic substrings
# ("ice cream" before "cream", "dry sauce mix" before "sauce").
PMO_DIM = [
    ("ice cream", "Ice cream & frozen desserts", "per 100 g/ml"),
    ("dry sauce mix", "Dry sauce mixes", "per 100 g"),
    ("hand cream", "Hand creams", "per 100 ml"),
    ("shaving", "Shaving creams", "per 100 g/ml"),
    ("edible oil", "Sauces & edible oils", "per 100 ml"),
    ("bubble bath", "Bubble-bath & shower foams", "per 100 ml"),
    ("shower foam", "Bubble-bath & shower foams", "per 100 ml"),
    ("herb", "Herbs", "per 10 g"),
    ("spice", "Spices", "per 10 g"),
    ("essence", "Flavouring essences", "per 10 ml"),
    ("colouring", "Food colourings", "per 10 ml"),
    ("seed", "Seeds (non-pea/bean)", "per 10 g"),
    ("make-up", "Cosmetic make-up", "per 10 g/ml"),
    ("rice", "Rice", "per 100 g"),
    ("pickle", "Pickles", "per 100 g"),
    ("sauce", "Sauces & edible oils", "per 100 ml"),
    ("salad", "Fresh processed salad", "per 100 g"),
    ("dessert", "Chilled desserts", "per 100 ml"),
    ("cream", "Cream", "per 100 ml"),
    ("bread", "Bread", "per 100 g"),
    ("biscuit", "Biscuits", "per 100 g"),
    ("pie", "Pies/pasties/flans", "per 100 g"),
    ("flan", "Pies/pasties/flans", "per 100 g"),
    ("jam", "Preserves", "per 100 g"),
    ("soup", "Soups", "per 100 g"),
    ("juice", "Fruit juices & soft drinks", "per 100 ml"),
    ("soft drink", "Fruit juices & soft drinks", "per 100 ml"),
    ("coffee", "Coffee", "per 100 g/ml"),
    ("tea", "Tea & infusions", "per 100 g"),
    ("confection", "Confectionery", "per 100 g"),
    ("chocolate", "Confectionery", "per 100 g"),
    ("crisps", "Snack foods (crisps, nuts, etc.)", "per 100 g"),
    ("nuts", "Snack foods (crisps, nuts, etc.)", "per 100 g"),
    ("cereal", "Breakfast cereals", "per 100 g"),
    ("lubricating", "Lubricating oils (non-engine)", "per 100 ml"),
    ("lotion", "Lotions & creams", "per 100 ml"),
    ("sunscreen", "Sun products", "per 100 ml"),
    ("toothpaste", "Oral products (toothpaste, mouthwash)", "per 100 g/ml"),
    ("mouthwash", "Oral products (toothpaste, mouthwash)", "per 100 g/ml"),
    ("lacquer", "Hair lacquer", "per 100 ml"),
    ("shampoo", "Hair shampoos & conditioners", "per 100 g/ml"),
    ("conditioner", "Hair shampoos & conditioners", "per 100 g/ml"),
    ("brilliantine", "Hair strengtheners & brilliantines", "per 100 ml"),
    ("deodorant", "Deodorants", "per 100 g/ml"),
    ("talcum", "Talcum powders", "per 100 g"),
    ("soap", "Toilet soaps", "per 100 g"),
    ("cologne", "Alcohol-based toiletries (<3 % perfume)", "per 100 ml"),
    ("tobacco", "Hand-rolling & pipe tobacco", "per 100 g"),
    ("wine", "Wine & fortified wine (750 ml pack)", "per 750 ml"),
    ("coal", "Coal", "per 50 kg"),
    ("ballast", "Ballast", "per 1,000 kg"),
]
_PMO_DIM_ROWS = [(i, *row) for i, row in enumerate(PMO_DIM)]
_PMO_DIM_COLS = ["dim_idx", "keyword", "pmo_category", "unit_price_basis"]

_PMO_COLS = ["row_id", "product_name", "description"]
PMO_FIXTURE = [
    (1, "Organic Basil Jar", "dried mediterranean herb"),
    (2, "Smoked Paprika", "ground spice blend"),
    (3, "Basmati Rice 1kg", "long grain"),
    (4, "Tomato Ketchup", "classic table sauce"),
    (5, "Orange Juice", "from concentrate"),
    (6, "Instant Coffee", "freeze dried granules"),
    (7, "Earl Grey", "black tea infusion bags"),
    (8, "Milk Chocolate Bar", "smooth and velvety"),
    (9, "Sea Salt Crisps", "sharing bag"),
    (10, "Corn Flakes", "toasted breakfast cereal"),
    (11, "Anti-Dandruff Shampoo", "for daily use"),
    (12, "Whitening Toothpaste", "fluoride formula"),
    (13, "Roll-On Deodorant", "48h protection"),
    (14, "Merlot 750ml", "red wine of southern France"),
    (15, "Vanilla Ice Cream Tub", "frozen"),
    (16, "Garden Vegetable Soup", "tinned"),
    (17, "Sourdough Loaf", "artisan bread"),
    (18, "Double Cream", "for pouring"),
    (19, "Mystery Gadget", "novelty item"),
    (20, "Luxury Gift Box", None),
]

_PMO_ORACLE = f"""
WITH {values_cte(PMO_FIXTURE, _PMO_COLS, 'p')},
{values_cte(_PMO_DIM_ROWS, _PMO_DIM_COLS, 'd')},
hits AS (
  SELECT p.row_id, d.dim_idx, d.pmo_category, d.unit_price_basis
  FROM p JOIN d
    ON instr(lower(p.product_name || ' ' || COALESCE(p.description, '')),
             d.keyword) > 0
),
best AS (
  SELECT row_id, pmo_category, unit_price_basis,
         ROW_NUMBER() OVER (PARTITION BY row_id ORDER BY dim_idx) AS rk
  FROM hits
)
SELECT p.row_id,
       COALESCE(b.pmo_category, 'unsure') AS pmo_category,
       COALESCE(b.unit_price_basis, 'per 1 item') AS unit_price_basis
FROM p LEFT JOIN best b ON b.row_id = p.row_id AND b.rk = 1
"""


@register("pmo_category_classify", oracle=_PMO_ORACLE)
def pmo_category_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UK Price Marking Order 2004 Schedule-1 classify
    (`prompts.py:1410-1452`): first matching keyword (dim order =
    priority) decides category + mandated unit-price basis; no match →
    ('unsure', 'per 1 item') per the prompt's rule 3. Broadcast-map
    probe + one window — scan speed at any scale."""
    p = spark_inline(spark, PMO_FIXTURE, _PMO_COLS)
    d = F.broadcast(spark_inline(spark, _PMO_DIM_ROWS, _PMO_DIM_COLS))
    text = F.lower(
        F.concat(F.col("product_name"), F.lit(" "), F.coalesce("description", F.lit("")))
    )
    hits = p.join(d, F.instr(text, F.col("keyword")) > 0).select(
        "row_id", "dim_idx", "pmo_category", "unit_price_basis"
    )
    wbest = W.partitionBy("row_id").orderBy("dim_idx")
    best = (
        hits.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select("row_id", "pmo_category", "unit_price_basis")
    )
    return p.join(best, "row_id", "left").select(
        "row_id",
        F.coalesce("pmo_category", F.lit("unsure")).alias("pmo_category"),
        F.coalesce("unit_price_basis", F.lit("per 1 item")).alias(
            "unit_price_basis"
        ),
    )


# ---------------------------------------------------------------------------
# Methylated-vitamin check (prompts.py:1577-1592)
# ---------------------------------------------------------------------------

# the two accepted synonym groups, in prompt order (= echo priority)
METHYL_SYNONYMS = [
    "5-MTHF",
    "L-5-MTHF",
    "L-5-Methyltetrahydrofolate",
    "5-Methyltetrahydrofolic acid",
    "Levomefolate",
    "Metafolin",
    "Quatrefolic",
    "Magnafolate",
    "Methylcobalamin",
    "Methyl-B12",
    "MeB12",
    "MeCbl",
    "Mecobalamin",
]


def _methyl_norm_py(s: str) -> str:
    return _re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()


_METHYL_DIM_ROWS = [
    (i, syn, _methyl_norm_py(syn)) for i, syn in enumerate(METHYL_SYNONYMS)
]
_METHYL_DIM_COLS = ["dim_idx", "synonym", "norm_syn"]

_MV_COLS = ["row_id", "ingredients"]
MV_FIXTURE = [
    (1, "Contains <b>Methylcobalamin</b> 500 µg per dose"),
    (2, "L-5-Methyltetrahydrofolate (as Metafolin®)"),
    (3, "folic acid and cyanocobalamin"),
    (4, ""),
    (5, None),
    (6, "MeB12 blend, rice flour, capsule shell"),
    (7, "Quatrefolic® acid; maltodextrin"),
    (8, "methyl-b12 and 5-MTHF combination"),
    (9, "plain multivitamin with B12 as cobalamin"),
]


def _methyl_norm_spark(col: Column) -> Column:
    """lower → strip HTML tags → non-alnum runs to single space → trim.
    Handles case, punctuation, tags and ®/™ in one pass (rule 1)."""
    detag = F.regexp_replace(col, "<[^>]+>", " ")
    return F.trim(F.regexp_replace(F.lower(detag), "[^a-z0-9]+", " "))


_MV_NORM_SQL = (
    "trim(regexp_replace(lower(regexp_replace(ingredients, '<[^>]+>', ' ', 'g')),"
    " '[^a-z0-9]+', ' ', 'g'))"
)

_MV_ORACLE = f"""
WITH {values_cte(MV_FIXTURE, _MV_COLS, 'm')},
{values_cte(_METHYL_DIM_ROWS, _METHYL_DIM_COLS, 'd')},
norm AS (
  SELECT row_id, ingredients,
         CASE WHEN ingredients IS NULL OR trim(ingredients) = '' THEN NULL
              ELSE ' ' || {_MV_NORM_SQL} || ' ' END AS padded
  FROM m
),
hits AS (
  SELECT n.row_id, d.dim_idx, d.synonym
  FROM norm n JOIN d ON instr(n.padded, ' ' || d.norm_syn || ' ') > 0
),
best AS (
  SELECT row_id, synonym,
         ROW_NUMBER() OVER (PARTITION BY row_id ORDER BY dim_idx) AS rk
  FROM hits
)
SELECT n.row_id,
       CASE WHEN n.padded IS NULL THEN 'Unsure'
            WHEN b.synonym IS NOT NULL THEN 'Yes' ELSE 'No' END
         AS contains_methylated_vitamin,
       COALESCE(b.synonym, '') AS "match"
FROM norm n LEFT JOIN best b ON b.row_id = n.row_id AND b.rk = 1
"""


@register("methylated_vitamin_check", oracle=_MV_ORACLE)
def methylated_vitamin_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Methylated folate/B12 membership (`prompts.py:1577-1592`):
    Yes + first-matching synonym (prompt order), No when clean, Unsure
    on blank/null text. Token-boundary match on a normalized padded
    string — case/punctuation/HTML/®™-blind per the prompt's rule 1."""
    m = spark_inline(spark, MV_FIXTURE, _MV_COLS)
    d = F.broadcast(spark_inline(spark, _METHYL_DIM_ROWS, _METHYL_DIM_COLS))
    padded = F.when(
        F.col("ingredients").isNull() | (F.trim("ingredients") == ""), F.lit(None)
    ).otherwise(
        F.concat(F.lit(" "), _methyl_norm_spark(F.col("ingredients")), F.lit(" "))
    )
    norm = m.select("row_id", padded.alias("padded"))
    hits = norm.join(
        d, F.instr(F.col("padded"), F.concat(F.lit(" "), F.col("norm_syn"), F.lit(" "))) > 0
    ).select("row_id", "dim_idx", "synonym")
    wbest = W.partitionBy("row_id").orderBy("dim_idx")
    best = (
        hits.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select("row_id", "synonym")
    )
    return norm.join(best, "row_id", "left").select(
        "row_id",
        F.when(F.col("padded").isNull(), "Unsure")
        .when(F.col("synonym").isNotNull(), "Yes")
        .otherwise("No")
        .alias("contains_methylated_vitamin"),
        F.coalesce("synonym", F.lit("")).alias("match"),
    )


# ---------------------------------------------------------------------------
# Novel-food screen (novel_check_utils.py:78-117, threshold app.py:454-456)
# ---------------------------------------------------------------------------

NOVEL_THRESHOLD_DEFAULT = 87

# (canonical, variant) pairs grafted from data/novel_list_expanded.csv
# (variants are the '|'-split Synonyms column, normalized lowercase)
NOVEL_DIM = [
    ("Chia seeds (Salvia hispanica)", "chia seeds"),
    ("Chia seeds (Salvia hispanica)", "salvia hispanica"),
    ("Adansonia digitata (Baobab) dried fruit pulp", "baobab"),
    ("Noni fruit juice (Morinda citrifolia)", "noni fruit juice"),
    ("Noni fruit juice (Morinda citrifolia)", "morinda citrifolia"),
    ("Antarctic Krill oil from Euphausia superba", "antarctic krill oil"),
    ("Galacto-oligosaccharide", "galacto oligosaccharide"),
    ("Astaxanthin-rich oleoresin from Haematococcus pluvialis algae", "astaxanthin"),
    ("Lacto-N-neotetraose", "lacto n neotetraose"),
    ("2'-Fucosyllactose", "2 fucosyllactose"),
]
_NOVEL_DIM_COLS = ["canonical", "variant"]

_NF_COLS = ["row_id", "ingredient_text"]
NOVEL_FIXTURE = [
    (1, "Water, chia seeds (5%), lemon juice"),
    (2, "Contains Salvia Hispanica and sugar; barley malt"),
    (3, "baobab fruit pulp powder, rice flour"),
    (4, "noni fruit juise, preservative"),  # 1 edit: fuzzy ≥ 87
    (5, "antartic krill oil softgel"),  # 1 edit inside 3-gram
    (6, "galacto-oligosacharide syrup"),  # hyphen + 1 edit
    (7, "plain oat flakes, salt"),
    (8, "astaxanthn extract"),  # 1 edit of an 11-char term
    (9, "morinda citrifolia concentrate; water"),
    (10, None),
    (11, "chia zeedz pudding cup"),  # ratio 80: visible at threshold 80 only
]


def _norm_sql(col: str) -> str:
    """normalize() twin (novel_check_utils.py:52-72, minus NFKD — the
    fixture is pure ASCII): mojibake fixes are shared with the caption
    path; lower + whitespace collapse here."""
    return f"trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"





def _novel_oracle(threshold: int) -> str:
    return f"""
WITH {values_cte(NOVEL_FIXTURE, _NF_COLS, 'nf')},
{values_cte(NOVEL_DIM, _NOVEL_DIM_COLS, 'd')},
segs AS (
  SELECT row_id, trim(s) AS segment
  FROM (
    SELECT row_id,
           unnest(string_split_regex({_norm_sql('ingredient_text')}, '[;,]')) AS s
    FROM nf WHERE ingredient_text IS NOT NULL
  )
  WHERE length(trim(s)) > 0
),
exact AS (
  SELECT s.row_id, d.canonical, CAST(100.0 AS DOUBLE) AS score
  FROM segs s JOIN d ON instr(s.segment, d.variant) > 0
),
grams AS ({word_grams_sql('segs', 'row_id, segment')}),
fz AS (
  SELECT g.row_id, d.canonical,
         100 * (1 - CAST(levenshtein(g.gram, d.variant) AS DOUBLE)
                    / GREATEST(length(g.gram), length(d.variant))) AS score
  FROM grams g JOIN d
    ON ABS(length(g.gram) - length(d.variant)) <= GREATEST(2, length(d.variant) * 0.25)
),
allhits AS (
  SELECT * FROM exact
  UNION ALL
  SELECT * FROM fz WHERE score >= {threshold}
)
SELECT row_id, canonical, ROUND(MAX(score), 2) AS best_score
FROM allhits GROUP BY row_id, canonical
"""


def novel_food_screen(
    spark: SparkSession, sf_dir: str, threshold: int = NOVEL_THRESHOLD_DEFAULT
) -> DataFrame:
    """Novel-food candidate screen (`find_novel_matches`,
    `novel_check_utils.py:78-117`): normalize, split on [;,], exact
    substring wins at 100, else levenshtein-ratio ≥ *threshold* on
    1-3-word segment grams (deterministic stand-in for
    token_set_ratio/partial_ratio — sandbox has no rapidfuzz); best
    score per (row, canonical). `threshold` mirrors the reference's
    slider (70-100, default 87)."""
    nf = spark_inline(spark, NOVEL_FIXTURE, _NF_COLS)
    d = F.broadcast(spark_inline(spark, NOVEL_DIM, _NOVEL_DIM_COLS))
    norm = F.trim(F.regexp_replace(F.lower(F.col("ingredient_text")), r"\s+", " "))
    segs = (
        nf.filter(F.col("ingredient_text").isNotNull())
        .select(
            "row_id",
            F.explode(
                F.filter(
                    F.transform(F.split(norm, "[;,]"), lambda s: F.trim(s)),
                    lambda s: F.length(s) > 0,
                )
            ).alias("segment"),
        )
    )
    exact = segs.join(d, F.instr(F.col("segment"), F.col("variant")) > 0).select(
        "row_id", "canonical", F.lit(100.0).alias("score")
    )
    grams = segs.select(
        "row_id", F.explode(word_grams(F.col("segment"))).alias("gram")
    ).dropDuplicates(["row_id", "gram"])
    fz = (
        grams.join(
            d,
            F.abs(F.length("gram") - F.length("variant"))
            <= F.greatest(F.lit(2), F.length("variant") * 0.25),
        )
        .withColumn(
            "score",
            100
            * (
                1
                - F.levenshtein("gram", "variant")
                / F.greatest(F.length("gram"), F.length("variant"))
            ),
        )
        .filter(F.col("score") >= threshold)
        .select("row_id", "canonical", "score")
    )
    return (
        exact.unionByName(fz)
        .groupBy("row_id", "canonical")
        .agg(F.round(F.max("score"), 2).alias("best_score"))
    )


register("novel_food_screen", oracle=_novel_oracle(NOVEL_THRESHOLD_DEFAULT))(
    novel_food_screen
)


# ---------------------------------------------------------------------------
# Supplier-address quality score
# (artwork_processing_supplier_addresses.py:109-173)
# ---------------------------------------------------------------------------

UK_POSTCODE_RE = r"(?i)\b(?:GIR\s?0AA|[A-Z]{1,2}\d[A-Z\d]?\s*\d[ABD-HJLNP-UW-Z]{2})\b"
STREET_RE = (
    r"\b(street|str\.?|road|rd\.?|avenue|ave\.?|way|close|park|industrial"
    r"|estate|unit|suite|po box|postbus)\b"
)
COMPANY_RE = r"\b(ltd\.?|limited|plc|gmbh|s\.?r\.?l\.?|s\.?a\.?|b\.?v\.?|slu|s\.?l\.?)\b"
UK_CUES = (
    "uk", "u.k.", "united kingdom", "england", "scotland", "wales", "gb",
    "great britain", "northern ireland",
)
EU_COUNTRIES = (
    "austria", "belgium", "bulgaria", "croatia", "cyprus", "czech republic",
    "czechia", "denmark", "estonia", "finland", "france", "germany", "greece",
    "hungary", "ireland", "italy", "latvia", "lithuania", "luxembourg",
    "malta", "netherlands", "poland", "portugal", "romania", "slovakia",
    "slovenia", "spain", "sweden",
)

_ADDR_COLS = ["row_id", "address", "expect"]
ADDR_FIXTURE = [
    (1, "Acme Foods Ltd\nUnit 5 Industrial Estate\nLondon\nNW1 4RT\nUnited Kingdom", "UK"),
    (2, "Beta GmbH\nBerlin\nGermany", "UK"),
    (3, "Gamma S.A.\n12 Rue de la Paix\nParis\nFrance", "EU"),
    (4, "Delta BV\nKeizersgracht 1\nAmsterdam\nNetherlands\nSW1A 1AA", "EU"),
    (5, "Epsilon Ltd\n42 Long Road,", "UK"),
    (6, None, "UK"),
    (7, "", "EU"),
    (8, "Zeta Foods\nYork", "UK"),
]

# score terms ×10 as integers (0.8 → 8) so both engines sum exactly;
# the final /10.0 is a single exact-in-double division
_NL = "chr(10)"


def _any_instr_sql(col: str, needles: tuple[str, ...]) -> str:
    return "(" + " OR ".join(f"instr({col}, '{n}') > 0" for n in needles) + ")"


_ADDR_ORACLE = f"""
WITH {values_cte(ADDR_FIXTURE, _ADDR_COLS, 'a')},
feat AS (
  SELECT row_id, expect, address,
         lower(COALESCE(address, '')) AS t,
         len(list_filter(string_split(COALESCE(address, ''), {_NL}),
                         x -> length(trim(x)) > 0)) AS n_lines,
         regexp_matches(lower(COALESCE(address, '')), '{STREET_RE}') AS has_street,
         regexp_matches(lower(COALESCE(address, '')), '{COMPANY_RE}') AS has_company,
         regexp_matches(COALESCE(address, ''), '{UK_POSTCODE_RE}') AS ukpc,
         CASE WHEN address IS NULL OR trim(address) = '' THEN FALSE
              WHEN right(trim(address), 1) IN (',', ';') THEN TRUE
              WHEN len(string_split_regex(trim(list_extract(
                     string_split(trim(address), {_NL}),
                     len(string_split(trim(address), {_NL})))), ' +')) <= 2
                   THEN TRUE ELSE FALSE END AS truncated
  FROM a
),
cues AS (
  SELECT *, {_any_instr_sql('t', UK_CUES)} AS ukm,
            {_any_instr_sql('t', EU_COUNTRIES)} AS eum
  FROM feat
)
SELECT row_id,
       CASE WHEN ukpc OR ukm THEN 'UK'
            WHEN eum THEN 'EU' ELSE 'UNK' END AS country_hint,
       CASE WHEN address IS NULL OR address = '' THEN CAST(0.0 AS DOUBLE)
            ELSE CAST(
         LEAST(n_lines, 5) * 8
         + (CASE WHEN has_street THEN 12 ELSE 0 END)
         + (CASE WHEN has_company THEN 8 ELSE 0 END)
         + (CASE WHEN expect = 'UK' THEN
               (CASE WHEN ukpc THEN 20 ELSE 0 END)
             + (CASE WHEN ukm THEN 10 ELSE 0 END)
             - (CASE WHEN eum THEN 10 ELSE 0 END)
            ELSE
               (CASE WHEN eum THEN 15 ELSE 0 END)
             - (CASE WHEN ukpc THEN 15 ELSE 0 END)
             - (CASE WHEN ukm THEN 8 ELSE 0 END)
            END)
         - (CASE WHEN truncated THEN 6 ELSE 0 END)
         AS DOUBLE) / 10 END AS score
FROM cues
"""


def _any_instr_spark(col: Column, needles: tuple[str, ...]) -> Column:
    cond = F.lit(False)
    for n in needles:
        cond = cond | (F.instr(col, n) > 0)
    return cond


@register("address_quality_score", oracle=_ADDR_ORACLE)
def address_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-address quality scoring + country hint
    (`artwork_processing_supplier_addresses.py:109-173`): line count
    (0.8/line, capped 5), street/company cues (+1.2/+0.8), expectation-
    conditioned UK-postcode/UK-cue/EU-country terms (+2.0/+1.0/−1.0 for
    UK expectation; +1.5/−1.5/−0.8 otherwise), truncation −0.6. Terms
    are summed ×10 in integers so both engines agree exactly; the
    single /10 division is exact in double."""
    a = spark_inline(spark, ADDR_FIXTURE, _ADDR_COLS)
    addr = F.coalesce(F.col("address"), F.lit(""))
    t = F.lower(addr)
    n_lines = F.size(
        F.filter(F.split(addr, "\n"), lambda x: F.length(F.trim(x)) > 0)
    )
    stripped = F.trim(F.col("address"))
    last_line = F.element_at(F.split(stripped, "\n"), -1)
    truncated = (
        F.when(F.col("address").isNull() | (stripped == ""), F.lit(False))
        .when(F.substring(stripped, -1, 1).isin(",", ";"), F.lit(True))
        .when(F.size(F.split(F.trim(last_line), " +")) <= 2, F.lit(True))
        .otherwise(F.lit(False))
    )
    ukpc = addr.rlike(UK_POSTCODE_RE)
    ukm = _any_instr_spark(t, UK_CUES)
    eum = _any_instr_spark(t, EU_COUNTRIES)
    score10 = (
        F.least(n_lines, F.lit(5)) * 8
        + F.when(t.rlike(STREET_RE), 12).otherwise(0)
        + F.when(t.rlike(COMPANY_RE), 8).otherwise(0)
        + F.when(
            F.col("expect") == "UK",
            F.when(ukpc, 20).otherwise(0)
            + F.when(ukm, 10).otherwise(0)
            - F.when(eum, 10).otherwise(0),
        ).otherwise(
            F.when(eum, 15).otherwise(0)
            - F.when(ukpc, 15).otherwise(0)
            - F.when(ukm, 8).otherwise(0)
        )
        - F.when(truncated, 6).otherwise(0)
    )
    score = F.when(
        F.col("address").isNull() | (F.col("address") == ""), F.lit(0.0)
    ).otherwise(score10.cast("double") / 10)
    hint = (
        F.when(ukpc | ukm, "UK").when(eum, "EU").otherwise("UNK")
    )
    return a.select("row_id", hint.alias("country_hint"), score.alias("score"))
