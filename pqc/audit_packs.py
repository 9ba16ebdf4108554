"""Audit / marketplace packs — the reference's remaining deterministic
prompt tables (VERDICT r2 "What's missing" items 1-7):

- Free-From quick-check (`prompts.py:1462-1499`): per-claim token
  vocabulary, token hit ⇒ needs_review, strict no-cross-claim leakage.
- Food-supplement classifier + mandatory-statement checklist
  (`prompts.py:1606-1615` dual criteria; `prompts.py:886-893` the four
  mandatory UK statements).
- Prohibited-marketplace rules (`prompts.py:854-866`): blades keyword
  list, infant dual-condition, counterfeit cue×trademark conjunction.
- Product Name & Variant extraction (`prompts.py:1293-1316`): variant
  excludes size/pack tokens, product name excludes variant words.
- AUDIT Nutritionals three-step scan (`prompts.py:1771-1804`):
  consumable/supplement keyword gates, panel presence, NRV/RI scan.
- Gelatin source evidence enum (`prompts.py:1331-1350`): explicit
  bovine/porcine token ⇒ that class, else Unknown Origin; ingredient
  statement is the primary source, variant description secondary.
- Nutrient-Data-Only per-100g extraction (`prompts.py:497-523`):
  '/'-split first value, unit normalisation, salt = sodium×2.5 with
  salt-priority.

Everything is pure Catalyst scalar expressions (when-ladders, regexp,
padded-token containment) over inline fixtures — these packs run at
scan speed over 10^12 rows (zero joins, zero shuffles except the
per-sku pivot in the nutrient extraction, which is one partial-agg
shuffle on the sku key). Token vocabularies are generated ONCE in
Python and rendered into both the Spark plan and the DuckDB oracle, so
the two engines evaluate literally the same decision tables.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pqc.registry import register
from pqc.rule_packs import spark_inline, values_cte

# ---------------------------------------------------------------------------
# Shared: word-boundary containment on a punctuation-normalised text
# ---------------------------------------------------------------------------


def _norm_token(tok: str) -> str:
    """Normalise a vocabulary entry the same way the text is normalised
    (lower, non-alnum runs → single space) so multi-word entries like
    'lecithin (soya)' or 'box-cutter' match their normalised form."""
    return _re.sub(r"[^a-z0-9]+", " ", tok.lower()).strip()


_PAD_SQL = "(' ' || regexp_replace(lower({src}), '[^a-z0-9]+', ' ', 'g') || ' ')"


def _pad_sql(src: str) -> str:
    """DuckDB: space-padded, punctuation-folded text for token search."""
    return _PAD_SQL.format(src=src)


def _pad_col(col: Column) -> Column:
    """Spark twin of :func:`_pad_sql`."""
    return F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "),
        F.lit(" "),
    )


def _has_tok_sql(pad: str, tok: str) -> str:
    return f"instr({pad}, ' {_norm_token(tok)} ') > 0"


def _has_tok(pad: Column, tok: str) -> Column:
    return F.instr(pad, f" {_norm_token(tok)} ") > 0


def _any_tok_sql(pad: str, toks: list[str]) -> str:
    return "(" + " OR ".join(_has_tok_sql(pad, t) for t in toks) + ")"


def _any_tok(pad: Column, toks: list[str]) -> Column:
    out = _has_tok(pad, toks[0])
    for t in toks[1:]:
        out = out | _has_tok(pad, t)
    return out


def _collapse_sql(src: str) -> str:
    """Whitespace-collapsed lowercase text for phrase (substring) search."""
    return f"trim(regexp_replace(lower({src}), '\\s+', ' ', 'g'))"


def _collapse_col(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


# ---------------------------------------------------------------------------
# 1. Free-From quick-check (prompts.py:1462-1499)
# ---------------------------------------------------------------------------

# claim → dedicated token list. A claim may ONLY be challenged by its
# own list ("lactose is *not* gluten") — the no-cross-claim rule.
FREE_FROM_VOCAB: dict[str, list[str]] = {
    "gluten free": ["wheat", "barley", "rye", "oats", "spelt", "kamut",
                    "triticale", "gluten", "malt", "semolina"],
    "dairy free": ["milk", "lactose", "whey", "casein", "cheese", "butter",
                   "cream"],
    "egg free": ["egg", "albumin", "ovalbumin"],
    "soya free": ["soy", "soya", "soja", "lecithin (soya)", "soy lecithin"],
    "peanut free": ["peanut", "peanuts", "groundnut", "arachis"],
    "nut free": ["almond", "hazelnut", "walnut", "cashew", "pecan",
                 "pistachio", "macadamia", "brazil nut"],
    "sesame seed free": ["sesame", "tahini"],
    "fish free": ["fish", "cod", "haddock", "tuna", "salmon", "sardine",
                  "anchovy"],
    "crustaceans free": ["prawn", "shrimp", "crab", "lobster"],
    "mollusc free": ["mussel", "oyster", "clam", "squid", "octopus"],
    "celery free": ["celery", "celeriac"],
    "mustard free": ["mustard"],
    "sulphites free": ["sulphite", "sulfur dioxide", "e220", "e221", "e222",
                       "e223", "e224", "e225", "e226", "e227", "e228"],
    "lupin free": ["lupin", "lupine"],
}

_FF_DIM_ROWS = [
    (claim, idx, _norm_token(tok))
    for claim, toks in FREE_FROM_VOCAB.items()
    for idx, tok in enumerate(toks)
]
_FF_DIM_COLS = ["claim", "tok_idx", "token"]

_FF_COLS = ["row_id", "claims", "ingredients"]
FREE_FROM_FIXTURE = [
    # gluten conflict (malt) but dairy clean — per-claim isolation
    (1, "gluten free; dairy free", "Water, Barley Malt Extract, Sugar"),
    # lactose must NOT flag gluten free (no-cross-claim rule)
    (2, "gluten free", "Milk solids, Lactose, Rice flour"),
    (3, "dairy free", "Milk solids, Lactose, Rice flour"),
    # multi-word vocab entry via punctuation fold: "Lecithin (Soya)"
    (4, "soya free", "Emulsifier: Lecithin (Soya), Cocoa mass"),
    # clean row
    (5, "nut free; egg free", "Oat flakes, honey, sunflower seeds"),
    # E-number token for sulphites
    (6, "sulphites free", "Dried apricots, preservative E220"),
    # 'groundnut' ⇒ peanut; 'almond' must not flag peanut free
    (7, "peanut free; nut free", "Groundnut oil, almond pieces"),
    # token boundary: 'creamed coconut' contains 'cream' only as prefix
    (8, "dairy free", "Creamed coconut, water"),
    (9, "fish free; mollusc free", "Squid ink, cod liver oil"),
    (10, "celery free", None),  # null ingredients → ok
]

_FF_ORACLE = f"""
WITH {values_cte(FREE_FROM_FIXTURE, _FF_COLS, 's')},
{values_cte(_FF_DIM_ROWS, _FF_DIM_COLS, 'v')},
cl AS (
  SELECT DISTINCT row_id, trim(unnest(string_split(lower(claims), ';'))) AS claim,
         {_pad_sql("COALESCE(ingredients, '')")} AS pad
  FROM s
),
hits AS (
  SELECT cl.row_id, cl.claim, v.tok_idx, v.token
  FROM cl JOIN v ON v.claim = cl.claim
  WHERE instr(cl.pad, ' ' || v.token || ' ') > 0
),
best AS (
  SELECT row_id, claim, MIN(tok_idx) AS tok_idx FROM hits GROUP BY 1, 2
),
tok AS (
  SELECT b.row_id, b.claim, h.token
  FROM best b JOIN hits h
    ON h.row_id = b.row_id AND h.claim = b.claim AND h.tok_idx = b.tok_idx
)
SELECT cl.row_id, cl.claim,
       CASE WHEN t.token IS NULL THEN 'ok' ELSE 'needs_review' END AS status,
       COALESCE(t.token, '') AS conflict_token
FROM cl LEFT JOIN tok t ON t.row_id = cl.row_id AND t.claim = cl.claim
"""


@register("gluten_free_check", oracle=_FF_ORACLE)
def gluten_free_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Free-From quick-check (`prompts.py:1462-1499`): one row per
    (sku, claim); a claim is challenged ONLY by tokens in its dedicated
    vocabulary list (lactose never flags gluten-free). Token matching
    is word-boundary-safe on punctuation-folded text, so multi-word
    entries ('lecithin (soya)', 'brazil nut') match as phrases and
    'creamed' never matches 'cream'. The conflict token reported is
    the first (lowest-index) vocabulary entry found — deterministic in
    both engines. Broadcast vocab dim; zero wide shuffles."""
    s = spark_inline(spark, FREE_FROM_FIXTURE, _FF_COLS)
    return _free_from_screen(spark, s).select(
        "row_id", "claim", "status", "conflict_token"
    )


def _free_from_screen(spark: SparkSession, s: DataFrame) -> DataFrame:
    """Shared free-from plan: explode claims → LEFT broadcast vocab
    join → ONE hash aggregation. The best (lowest-index) conflict is a
    conditional MIN over a (tok_idx, token) struct, so no hits-subquery
    join-back is needed — rows with zero conflicts aggregate to NULL
    and read 'ok'. Single shuffle, keyed (row_id, claim), map-side
    combined."""
    v = F.broadcast(spark_inline(spark, _FF_DIM_ROWS, _FF_DIM_COLS))
    cl = s.select(
        "row_id",
        F.explode(F.split(F.lower("claims"), ";")).alias("claim_raw"),
        _pad_col(F.coalesce(F.col("ingredients"), F.lit(""))).alias("pad"),
    ).select("row_id", F.trim("claim_raw").alias("claim"), "pad")
    hit = F.instr(F.col("pad"), F.concat(F.lit(" "), F.col("token"), F.lit(" "))) > 0
    best = F.min(F.when(hit, F.struct("tok_idx", "token")))
    return (
        cl.join(v, "claim", "left")
        .groupBy("row_id", "claim")
        .agg(best.alias("best"))
        .select(
            "row_id",
            "claim",
            F.when(F.col("best").isNull(), "ok")
            .otherwise("needs_review")
            .alias("status"),
            F.coalesce(F.col("best.token"), F.lit("")).alias("conflict_token"),
        )
    )


# ---------------------------------------------------------------------------
# 2. Food-supplement classifier + mandatory statements
#    (prompts.py:1606-1615 criteria; prompts.py:886-893 statements)
# ---------------------------------------------------------------------------

_FS_COLS = ["row_id", "text"]
FOOD_SUPPLEMENT_FIXTURE = [
    # full pass: phrase + dose + all four mandatory statements
    (1, "Vitamin D3 Food Supplement. Take one tablet daily. "
        "Do not exceed the recommended dose. Food supplements should not "
        "be used as a substitute for a varied diet. "
        "Keep out of reach of young children. 25 ug 500% NRV"),
    # supplement (phrase + NRV) but missing the varied-diet statement
    (2, "Dietary supplement with zinc, 100% NRV per capsule. Take two "
        "capsules daily. Do not exceed the recommended dose. "
        "Keep out of reach of young children."),
    # phrase present but NO dose/NRV/do-not-exceed ⇒ not a supplement
    (3, "A food supplement style herbal blend for everyday vitality."),
    # dose present but phrase absent ⇒ not a supplement
    (4, "Herbal tea. Take one cup daily for a moment of calm."),
    # supplement via do-not-exceed-intake wording; missing children stmt
    (5, "Iron food supplement. Do not exceed the recommended intake. "
        "Take one capsule daily. Should not be used as a substitute "
        "for a varied diet."),
    # plainly not a supplement
    (6, "Sea salt crisps, sharing bag. May contain traces of nuts."),
    (7, None),  # null text → not a supplement
]

_DOSE_RE = (
    r"take (one|two|three|[0-9]+) (capsule|capsules|tablet|tablets|"
    r"gummies|drops|cup|cups)s? (daily|per day|a day)"
)
_SUBST_PHRASE = "should not be used as a substitute for a varied diet"
_CHILD_PHRASE = "keep out of reach of young children"
_DNE_DOSE = "do not exceed the recommended dose"
_DNE_INTAKE = "do not exceed the recommended intake"


def _fs_flags_sql(txt: str) -> dict[str, str]:
    pad = _pad_sql(txt)
    col = _collapse_sql(txt)
    return {
        "has_phrase": (
            f"(instr({col}, 'food supplement') > 0 OR "
            f"instr({col}, 'dietary supplement') > 0)"
        ),
        "has_dose": f"regexp_matches({col}, '{_DOSE_RE}')",
        "has_nrv": (
            f"({_has_tok_sql(pad, 'nrv')} OR {_has_tok_sql(pad, 'ri')} OR "
            f"instr({col}, 'reference intake') > 0)"
        ),
        "has_dne": (
            f"(instr({col}, '{_DNE_DOSE}') > 0 OR "
            f"instr({col}, '{_DNE_INTAKE}') > 0)"
        ),
        "m_subst": f"instr({col}, '{_SUBST_PHRASE}') > 0",
        "m_child": f"instr({col}, '{_CHILD_PHRASE}') > 0",
        "m_dne_dose": f"instr({col}, '{_DNE_DOSE}') > 0",
    }


def _fs_flags(col: Column) -> dict[str, Column]:
    pad = _pad_col(col)
    c = _collapse_col(col)
    return {
        "has_phrase": (F.instr(c, "food supplement") > 0)
        | (F.instr(c, "dietary supplement") > 0),
        "has_dose": c.rlike(_DOSE_RE),
        "has_nrv": _has_tok(pad, "nrv")
        | _has_tok(pad, "ri")
        | (F.instr(c, "reference intake") > 0),
        "has_dne": (F.instr(c, _DNE_DOSE) > 0) | (F.instr(c, _DNE_INTAKE) > 0),
        "m_subst": F.instr(c, _SUBST_PHRASE) > 0,
        "m_child": F.instr(c, _CHILD_PHRASE) > 0,
        "m_dne_dose": F.instr(c, _DNE_DOSE) > 0,
    }


_fsf = _fs_flags_sql("COALESCE(text, '')")
_FS_ORACLE = f"""
WITH {values_cte(FOOD_SUPPLEMENT_FIXTURE, _FS_COLS, 's')},
flags AS (
  SELECT row_id,
         ({_fsf['has_phrase']} AND ({_fsf['has_dose']} OR {_fsf['has_nrv']}
           OR {_fsf['has_dne']})) AS is_supplement,
         {_fsf['has_dose']} AS m_dose,
         {_fsf['m_dne_dose']} AS m_dne,
         {_fsf['m_subst']} AS m_subst,
         {_fsf['m_child']} AS m_child
  FROM s
)
SELECT row_id, is_supplement,
       CASE WHEN is_supplement
            THEN CAST(NOT m_dose AS INT) + CAST(NOT m_dne AS INT)
               + CAST(NOT m_subst AS INT) + CAST(NOT m_child AS INT)
            ELSE 0 END AS n_missing,
       CASE WHEN NOT is_supplement THEN 'Skipped'
            WHEN m_dose AND m_dne AND m_subst AND m_child THEN 'Pass'
            ELSE 'Fail' END AS overall
FROM flags
"""


@register("food_supplement_check", oracle=_FS_ORACLE)
def food_supplement_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Food-supplement classifier (`prompts.py:1606-1615`): supplement
    iff the explicit phrase ('food supplement'/'dietary supplement')
    AND a second criterion (measured daily dose ∨ NRV/%RI mention ∨
    do-not-exceed clause). If classified, the mandatory UK statement
    checklist (`prompts.py:886-893`) must ALL be present for Pass:
    advised daily dose, do-not-exceed-dose clause, varied-diet
    substitute statement, keep-out-of-reach-of-children. Non-
    supplements skip the compliance check (reference step 3)."""
    s = spark_inline(spark, FOOD_SUPPLEMENT_FIXTURE, _FS_COLS)
    f = _fs_flags(F.coalesce(F.col("text"), F.lit("")))
    is_sup = f["has_phrase"] & (f["has_dose"] | f["has_nrv"] | f["has_dne"])
    missing = (
        (~f["has_dose"]).cast("int")
        + (~f["m_dne_dose"]).cast("int")
        + (~f["m_subst"]).cast("int")
        + (~f["m_child"]).cast("int")
    )
    all_ok = f["has_dose"] & f["m_dne_dose"] & f["m_subst"] & f["m_child"]
    return s.select(
        "row_id",
        is_sup.alias("is_supplement"),
        F.when(is_sup, missing).otherwise(0).alias("n_missing"),
        F.when(~is_sup, "Skipped")
        .when(all_ok, "Pass")
        .otherwise("Fail")
        .alias("overall"),
    )


# ---------------------------------------------------------------------------
# 3. Prohibited-marketplace rules (prompts.py:854-866)
# ---------------------------------------------------------------------------

BLADES_TOKENS = [
    "knife", "knives", "blade", "razor", "scalpel", "machete", "axe",
    "cleaver", "chopper", "box-cutter", "stanley", "sword", "katana",
    "kukri", "sharpened",
]
INFANT_EDIBLE = ["puree", "pouch", "cereal", "milk", "formula", "snack", "drink"]
INFANT_REFS = ["baby", "infant", "toddler", "weaning",
               "stage 1", "stage 2", "stage 3"]
_INFANT_AGE_RE = r"[0-9]+ ?m\+"  # "4 m+", "6m+"
COUNTERFEIT_CUES = ["replica", "inspired by", "dupe", "smells like",
                    "compatible with"]
TRADEMARKS = ["chanel", "nike", "apple", "dior", "adidas", "rolex"]

_PM_COLS = ["row_id", "text"]
PROHIBITED_FIXTURE = [
    (1, "Stainless steel chef knife with 5 inch blade"),
    (2, "Relaxed fit yoga mat"),  # 'axe' inside 'relaxed' must NOT flag
    (3, "Organic baby rice cereal, stage 1, from 4 m+"),
    (4, "Baby soft cotton hoodie for adults"),  # not edible → no flag
    (5, "Eau de parfum inspired by Chanel No. 5"),
    (6, "Compatible with most kitchen mixers"),  # cue without trademark
    (7, "Sharpened bamboo garden stakes"),
    (8, "Toddler milk formula pouch 6 m+"),
    (9, "Retro replica football shirt, Adidas originals"),
    (10, "Lavender pillow spray for better sleep"),
]

_pm_pad = _pad_sql("text")
_pm_low = "lower(text)"
_PM_ORACLE = f"""
WITH {values_cte(PROHIBITED_FIXTURE, _PM_COLS, 's')},
flags AS (
  SELECT row_id,
         {_any_tok_sql(_pm_pad, BLADES_TOKENS)} AS blades,
         ({_any_tok_sql(_pm_pad, INFANT_EDIBLE)} AND
          ({_any_tok_sql(_pm_pad, INFANT_REFS)}
           OR regexp_matches({_pm_low}, '{_INFANT_AGE_RE}'))) AS infant,
         ({_any_tok_sql(_pm_pad, COUNTERFEIT_CUES)} AND
          {_any_tok_sql(_pm_pad, TRADEMARKS)}) AS counterfeit
  FROM s
)
SELECT row_id,
       CASE WHEN blades THEN 'Age Restricted: Knives or Blades'
            WHEN infant THEN 'Infant Food or Weaning Aid'
            WHEN counterfeit THEN 'Counterfeit or IP Violations'
            ELSE 'None' END AS matched_category,
       CASE WHEN blades OR infant OR counterfeit THEN 'Yes' ELSE 'No' END
         AS prohibited_flag
FROM flags
"""


@register("prohibited_marketplace_screen", oracle=_PM_ORACLE)
def prohibited_marketplace_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prohibited-marketplace screen (`prompts.py:854-866`), the three
    deterministic category legs: blades keyword list (word-boundary —
    'relaxed' never matches 'axe'), infant food dual-condition (edible
    token AND infant reference/age mark), counterfeit cue × trademark
    conjunction ('inspired by' alone never flags). First-match category
    ladder in the reference's listing order. Pure scalar expressions —
    scan-speed at any scale."""
    s = spark_inline(spark, PROHIBITED_FIXTURE, _PM_COLS)
    pad = _pad_col(F.col("text"))
    low = F.lower(F.col("text"))
    blades = _any_tok(pad, BLADES_TOKENS)
    infant = _any_tok(pad, INFANT_EDIBLE) & (
        _any_tok(pad, INFANT_REFS) | low.rlike(_INFANT_AGE_RE)
    )
    counterfeit = _any_tok(pad, COUNTERFEIT_CUES) & _any_tok(pad, TRADEMARKS)
    return s.select(
        "row_id",
        F.when(blades, "Age Restricted: Knives or Blades")
        .when(infant, "Infant Food or Weaning Aid")
        .when(counterfeit, "Counterfeit or IP Violations")
        .otherwise("None")
        .alias("matched_category"),
        F.when(blades | infant | counterfeit, "Yes").otherwise("No").alias(
            "prohibited_flag"
        ),
    )


# ---------------------------------------------------------------------------
# 4. Product Name & Variant extraction (prompts.py:1293-1316)
# ---------------------------------------------------------------------------

# flavour lexicon — list order is match priority (multi-word first)
FLAVOURS = [
    "blood orange & rosemary", "salted caramel", "lemon & lime",
    "chocolate orange", "blood orange", "vanilla", "strawberry", "mint",
    "blueberry", "raspberry",
]
_STRENGTH_RE = r"[0-9]+ ?(mg|mcg|iu)\b"
_SIZE_RE = r"[0-9]+ ?(ml|g|kg|l)\b"
_PACK_RE = r"[0-9]+ ?(tablets|capsules|gummies|sachets|teabags|pack)\b"
_MULT_RE = r"[0-9]+ ?[x×] ?[0-9]+ ?(g|ml)\b"
_TM_RE = r"(™|®|&trade;|&reg;)"

_PNV_COLS = ["row_id", "brand", "sku_name", "quantity_string"]
PRODUCT_NAME_FIXTURE = [
    (1, "Holland & Barrett", "Holland & Barrett Vitamin D3 1000 mg 120 Tablets",
     "120 tablets"),
    (2, "Nakd", "Nakd Raw Fruit & Nut Bar Salted Caramel 4x35g", "4x35g"),
    (3, "Grenade", "Grenade Protein Shake Blood Orange & Rosemary 330ml",
     "330 ml"),
    (4, "Pukka", "Pukka Mint Refresh Tea 20 Teabags", "20 teabags"),
    (5, "Solgar", "Solgar® Magnesium Citrate 200 mg 90 Tablets", "90 tablets"),
    (6, "Beurer", "Beurer Daylight Lamp", None),  # no variant at all
    (7, "Optibac", "Optibac Probiotics Every Day 30 Capsules", "30 capsules"),
    (8, "Twinings", "Twinings Earl Grey 100g Loose Tea Vanilla", "100 g"),
]


def _pnv_sql() -> str:
    # lower → strip ™/® → collapse; remove brand, variant, size/pack
    low = f"regexp_replace(lower(sku_name), '{_TM_RE}', ' ', 'g')"
    brand_low = f"regexp_replace(lower(brand), '{_TM_RE}', ' ', 'g')"
    flav_case = "CASE " + " ".join(
        f"WHEN instr(low, '{fl}') > 0 THEN '{fl}'" for fl in FLAVOURS
    ) + " ELSE NULL END"
    proper = (
        "array_to_string(list_transform(string_split({s}, ' '), "
        "x -> upper(x[1]) || lower(x[2:])), ' ')"
    )
    return f"""
WITH {values_cte(PRODUCT_NAME_FIXTURE, _PNV_COLS, 's')},
base AS (
  SELECT row_id,
         trim(regexp_replace({low}, '\\s+', ' ', 'g')) AS low,
         trim(regexp_replace({brand_low}, '\\s+', ' ', 'g')) AS brand_low
  FROM s
),
var AS (
  SELECT row_id, low, brand_low,
         COALESCE({flav_case},
                  regexp_extract(low, '{_STRENGTH_RE}'), '') AS variant
  FROM base
),
named AS (
  SELECT row_id, brand_low, variant,
         trim(regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   replace(replace(low, brand_low, ' '),
                           CASE WHEN variant = '' THEN chr(1)
                                ELSE variant END, ' '),
                   '{_MULT_RE}', ' ', 'g'),
                 '{_PACK_RE}', ' ', 'g'),
               '{_SIZE_RE}', ' ', 'g'),
             '{_STRENGTH_RE}', ' ', 'g'),
           '\\s+', ' ', 'g')) AS name_core
  FROM var
)
SELECT row_id,
       {proper.format(s="trim(brand_low || ' ' || name_core)")} AS product_name,
       {proper.format(s='variant')} AS variant_name
FROM named
"""


@register("product_name_variant", oracle=_pnv_sql())
def product_name_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product Name & Variant extraction (`prompts.py:1293-1316`):
    variant = flavour (lexicon, multi-word priority) else strength
    (mg/mcg/iu), NEVER size or pack-count; product name = brand +
    descriptor with trademark symbols dropped, Proper Case, and —
    by construction — no repetition of variant words (the variant
    substring is removed before casing). Size/pack/multipack tokens
    are stripped from the name per the reference's exclusion rule."""
    s = spark_inline(spark, PRODUCT_NAME_FIXTURE, _PNV_COLS)
    low = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("sku_name"), _TM_RE, " "), r"\s+", " "
        )
    )
    brand_low = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("brand"), _TM_RE, " "), r"\s+", " "
        )
    )
    flav = F.lit(None).cast("string")
    for fl in reversed(FLAVOURS):
        flav = F.when(F.instr(low, fl) > 0, fl).otherwise(flav)
    variant = F.coalesce(flav, F.regexp_extract(low, _STRENGTH_RE, 0), F.lit(""))
    name_core = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(
                            F.replace(
                                F.replace(low, brand_low, F.lit(" ")),
                                F.when(variant == "", F.lit("\x01")).otherwise(
                                    variant
                                ),
                                F.lit(" "),
                            ),
                            _MULT_RE,
                            " ",
                        ),
                        _PACK_RE,
                        " ",
                    ),
                    _SIZE_RE,
                    " ",
                ),
                _STRENGTH_RE,
                " ",
            ),
            r"\s+",
            " ",
        )
    )
    return s.select(
        "row_id",
        F.initcap(F.trim(F.concat(brand_low, F.lit(" "), name_core))).alias(
            "product_name"
        ),
        F.initcap(variant).alias("variant_name"),
    )


# ---------------------------------------------------------------------------
# 5. AUDIT Nutritionals three-step scan (prompts.py:1771-1804)
# ---------------------------------------------------------------------------

CONSUMABLE_TOKENS = ["vitamin", "supplement", "tablet", "gummy",
                     "effervescent", "tea", "honey", "powder", "drink", "food"]
SUPPLEMENT_TOKENS = ["vitamin", "supplement", "tablet", "gummy", "effervescent"]
PANEL_PHRASES = ["nutrition", "typical values"]

_AN_COLS = ["row_id", "product_data"]
AUDIT_NUTRI_FIXTURE = [
    # supplement, panel, NRV → all Pass
    (1, "Vitamin C 1000mg tablets. Nutrition per tablet: vitamin C 1000 mg "
        "1250% NRV."),
    # supplement, panel, no NRV/RI → Missing NRV
    (2, "Effervescent magnesium supplement. Typical values per dose: "
        "magnesium 375 mg."),
    # supplement, no panel → Missing Data
    (3, "Daily multivitamin gummy for adults, berry flavour."),
    # consumable non-supplement with panel → Pass / NRV not required
    (4, "Green tea drink. Nutrition facts: energy 2 kJ per 100 ml."),
    # consumable non-supplement without panel → Missing Data
    (5, "Raw forest honey, 340 g jar."),
    # not consumable at all → both Pass
    (6, "Bamboo toothbrush with charcoal bristles."),
    # 'RI' word-boundary: 'riboflavin' alone must not count as RI
    (7, "Vitamin B tablet. Nutrition: riboflavin 1.4 mg."),
    (8, "Vitamin B tablet. Nutrition: riboflavin 1.4 mg 100% RI."),
]

_an_pad = _pad_sql("product_data")
_an_col = _collapse_sql("product_data")
_AN_ORACLE = f"""
WITH {values_cte(AUDIT_NUTRI_FIXTURE, _AN_COLS, 's')},
flags AS (
  SELECT row_id,
         {_any_tok_sql(_an_pad, CONSUMABLE_TOKENS)} AS consumable,
         {_any_tok_sql(_an_pad, SUPPLEMENT_TOKENS)} AS supplement,
         (instr({_an_col}, 'nutrition') > 0 OR
          instr({_an_col}, 'typical values') > 0) AS panel,
         ({_has_tok_sql(_an_pad, 'nrv')} OR {_has_tok_sql(_an_pad, 'ri')})
           AS nrv_seen
  FROM s
)
SELECT row_id, consumable, supplement,
       CASE WHEN NOT consumable THEN 'Pass'
            WHEN panel THEN 'Pass' ELSE 'Fail' END AS nutrition_flag,
       CASE WHEN NOT supplement THEN 'Pass'
            WHEN panel AND nrv_seen THEN 'Pass' ELSE 'Fail' END AS nrv_flag,
       CASE WHEN consumable AND NOT panel THEN 'Missing Data'
            WHEN supplement AND panel AND NOT nrv_seen THEN 'Missing NRV'
            ELSE '' END AS error_type
FROM flags
"""


@register("audit_nutritionals_scan", oracle=_AN_ORACLE)
def audit_nutritionals_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIT Nutritionals (`prompts.py:1771-1804`), the rigid 3-step
    scan: consumable/supplement keyword gates over the lower-cased
    blob, nutrition-panel presence ('nutrition' / 'typical values'),
    and — supplements only — an NRV/RI word-boundary scan ('riboflavin'
    never counts as 'RI'). Non-consumables pass both flags; consumable
    non-supplements never require NRV (reference step 3)."""
    s = spark_inline(spark, AUDIT_NUTRI_FIXTURE, _AN_COLS)
    pad = _pad_col(F.col("product_data"))
    col = _collapse_col(F.col("product_data"))
    consumable = _any_tok(pad, CONSUMABLE_TOKENS)
    supplement = _any_tok(pad, SUPPLEMENT_TOKENS)
    panel = (F.instr(col, "nutrition") > 0) | (F.instr(col, "typical values") > 0)
    nrv = _has_tok(pad, "nrv") | _has_tok(pad, "ri")
    return s.select(
        "row_id",
        consumable.alias("consumable"),
        supplement.alias("supplement"),
        F.when(~consumable, "Pass").when(panel, "Pass").otherwise("Fail").alias(
            "nutrition_flag"
        ),
        F.when(~supplement, "Pass")
        .when(panel & nrv, "Pass")
        .otherwise("Fail")
        .alias("nrv_flag"),
        F.when(consumable & ~panel, "Missing Data")
        .when(supplement & panel & ~nrv, "Missing NRV")
        .otherwise("")
        .alias("error_type"),
    )


# ---------------------------------------------------------------------------
# 6. Gelatin source evidence enum (prompts.py:1331-1350)
# ---------------------------------------------------------------------------

BEEF_TOKENS = ["beef", "bovine"]
PORK_TOKENS = ["pork", "porcine"]

_GS_COLS = ["row_id", "full_ingredients", "variants_description"]
GELATIN_FIXTURE = [
    (1, "Capsule shell (bovine gelatin), fish oil", "Omega-3 softgels"),
    (2, "Gelatin (pork), sugar, glucose syrup", "Chewy sweets"),
    (3, "Gelatin, sugar, colourings", "Classic gummy bears"),
    # evidence only in the variant description (secondary source)
    (4, "Gelatin capsule, magnesium oxide", "Made with beef gelatin"),
    # conflicting evidence ⇒ Unknown (never guess)
    (5, "Beef and porcine gelatin blend", "Mixed source"),
    # ingredients silent, description silent → Unknown
    (6, "Gelatine, citric acid", None),
    # ingredient statement beats contradicting description (primary truth)
    (7, "Porcine gelatin, sweetener", "Premium beef-free recipe"),
]

_gs_ing = _pad_sql("COALESCE(full_ingredients, '')")
_gs_desc = _pad_sql("COALESCE(variants_description, '')")
_GS_ORACLE = f"""
WITH {values_cte(GELATIN_FIXTURE, _GS_COLS, 's')},
ev AS (
  SELECT row_id,
         {_any_tok_sql(_gs_ing, BEEF_TOKENS)} AS beef_ing,
         {_any_tok_sql(_gs_ing, PORK_TOKENS)} AS pork_ing,
         {_any_tok_sql(_gs_desc, BEEF_TOKENS)} AS beef_desc,
         {_any_tok_sql(_gs_desc, PORK_TOKENS)} AS pork_desc
  FROM s
  WHERE {_has_tok_sql(_gs_ing, 'gelatin')} OR {_has_tok_sql(_gs_ing, 'gelatine')}
)
SELECT row_id,
       CASE WHEN beef_ing AND NOT pork_ing THEN 'Gelatin - Beef'
            WHEN pork_ing AND NOT beef_ing THEN 'Gelatin - Porcine'
            WHEN beef_ing AND pork_ing THEN 'Gelatin - Unknown Origin'
            WHEN beef_desc AND NOT pork_desc THEN 'Gelatin - Beef'
            WHEN pork_desc AND NOT beef_desc THEN 'Gelatin - Porcine'
            ELSE 'Gelatin - Unknown Origin' END AS gelatin_source
FROM ev
"""


@register("gelatin_source_classify", oracle=_GS_ORACLE)
def gelatin_source_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gelatin source classifier (`prompts.py:1331-1350`): explicit-
    evidence-only 3-way enum. The ingredient statement is the primary
    source of truth (a 'beef-free' marketing description never
    overrides 'porcine gelatin' in the ingredients); the variant
    description is consulted only when the ingredients are silent.
    Conflicting explicit evidence ⇒ Unknown Origin — never guess."""
    s = spark_inline(spark, GELATIN_FIXTURE, _GS_COLS)
    ing = _pad_col(F.coalesce(F.col("full_ingredients"), F.lit("")))
    desc = _pad_col(F.coalesce(F.col("variants_description"), F.lit("")))
    beef_i, pork_i = _any_tok(ing, BEEF_TOKENS), _any_tok(ing, PORK_TOKENS)
    beef_d, pork_d = _any_tok(desc, BEEF_TOKENS), _any_tok(desc, PORK_TOKENS)
    return (
        s.filter(_has_tok(ing, "gelatin") | _has_tok(ing, "gelatine"))
        .select(
            "row_id",
            F.when(beef_i & ~pork_i, "Gelatin - Beef")
            .when(pork_i & ~beef_i, "Gelatin - Porcine")
            .when(beef_i & pork_i, "Gelatin - Unknown Origin")
            .when(beef_d & ~pork_d, "Gelatin - Beef")
            .when(pork_d & ~beef_d, "Gelatin - Porcine")
            .otherwise("Gelatin - Unknown Origin")
            .alias("gelatin_source"),
        )
    )


# ---------------------------------------------------------------------------
# 7. Nutrient-Data-Only per-100g extraction (prompts.py:497-523)
# ---------------------------------------------------------------------------

_ND_COLS = ["sku", "name", "nutrient", "value_str", "unit"]
NUTRIENT_FIXTURE = [
    # '/'-separated per-100g / per-serving pairs → take FIRST part
    ("SKU1", "Oat Granola", "Energy", "1650 / 412", "kJ"),
    ("SKU1", "Oat Granola", "Saturated Fat", "1.2 / 0.3", "g"),
    ("SKU1", "Oat Granola", "Sugars", "18.4 / 4.6", "g"),
    ("SKU1", "Oat Granola", "Salt", "0.9 / 0.22", "g"),
    ("SKU1", "Oat Granola", "Fibre", "7.1 / 1.8", "g"),
    ("SKU1", "Oat Granola", "Protein", "10.5 / 2.6", "g"),
    # single values (assumed per 100 g); sodium→salt conversion ×2.5
    ("SKU2", "Tomato Soup", "Energy", "180", "kJ"),
    ("SKU2", "Tomato Soup", "Saturated Fat", "0.4", "g"),
    ("SKU2", "Tomato Soup", "Sugars", "4.8", "g"),
    ("SKU2", "Tomato Soup", "Sodium", "480", "mg"),
    ("SKU2", "Tomato Soup", "Fibre", "1.1", "g"),
    ("SKU2", "Tomato Soup", "Protein", "1.6", "g"),
    # BOTH salt and sodium present → salt wins (priority rule)
    ("SKU3", "Rice Cakes", "Salt", "300", "mg"),
    ("SKU3", "Rice Cakes", "Sodium", "999", "mg"),
    ("SKU3", "Rice Cakes", "Energy", "1550", "kJ"),
    # µg rows are ignored for this task; missing nutrients → NULL
    ("SKU4", "Vitamin Water", "Energy", "95", "kJ"),
    ("SKU4", "Vitamin Water", "Vitamin B12", "2.5", "µg"),
    ("SKU4", "Vitamin Water", "Sugars", "4.4", "g"),
]

# first '/'-part → number; grams→mg where the output unit is mg
_NUM_RE = "[0-9]+(\\.[0-9]+)?"


def _nd_val_sql() -> str:
    return (
        "CAST(regexp_extract(trim(split_part(value_str, '/', 1)), "
        f"'{_NUM_RE}') AS DOUBLE)"
    )


_ND_EX_ORACLE = f"""
WITH {values_cte(NUTRIENT_FIXTURE, _ND_COLS, 's')},
p AS (
  SELECT sku, name, lower(nutrient) AS nut, lower(unit) AS u,
         {_nd_val_sql()} AS v
  FROM s
),
piv AS (
  SELECT sku, name,
         MAX(CASE WHEN nut = 'energy' AND u = 'kj' THEN v END) AS energy_kj,
         MAX(CASE WHEN nut IN ('saturated fat', 'saturates') AND u = 'g'
                  THEN v END) AS satfat_g,
         MAX(CASE WHEN nut = 'sugars' AND u = 'g' THEN v END) AS sugars_g,
         MAX(CASE WHEN nut = 'salt'
                  THEN CASE WHEN u = 'g' THEN v * 1000 ELSE v END END) AS salt_mg,
         MAX(CASE WHEN nut = 'sodium'
                  THEN CASE WHEN u = 'g' THEN v * 1000 ELSE v END END)
           AS sodium_mg,
         MAX(CASE WHEN nut = 'fibre' AND u = 'g' THEN v END) AS fibre_g,
         MAX(CASE WHEN nut = 'protein' AND u = 'g' THEN v END) AS protein_g
  FROM p GROUP BY sku, name
)
SELECT sku, name,
       energy_kj AS energy_kj_per_100g,
       satfat_g AS saturated_fat_g_per_100g,
       sugars_g AS sugars_g_per_100g,
       COALESCE(salt_mg, sodium_mg * 2.5) AS salt_mg_per_100g,
       fibre_g AS fibre_g_per_100g,
       protein_g AS protein_g_per_100g
FROM piv
"""


@register("nutrient_per100g_extract", oracle=_ND_EX_ORACLE)
def nutrient_per100g_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nutrient-Data-Only extraction (`prompts.py:497-523`): per-100g
    values from a raw nutritionals array — '/'-separated values take
    the FIRST part (per-100g), single values are assumed per-100g,
    grams→mg normalisation for salt/sodium, salt = sodium×2.5 only
    when no explicit salt row exists (salt priority), µg rows ignored.
    One partial-agg pivot shuffle on the sku key — at 10^12 rows this
    is the canonical map-side-combine groupBy."""
    s = spark_inline(spark, NUTRIENT_FIXTURE, _ND_COLS)
    v = F.regexp_extract(
        F.trim(F.element_at(F.split("value_str", "/"), 1)), _NUM_RE, 0
    ).cast("double")
    p = s.select(
        "sku",
        "name",
        F.lower("nutrient").alias("nut"),
        F.lower("unit").alias("u"),
        v.alias("v"),
    )

    def _grab(cond):
        return F.max(F.when(cond, F.col("v")))

    mg = F.when(F.col("u") == "g", F.col("v") * 1000).otherwise(F.col("v"))
    piv = p.groupBy("sku", "name").agg(
        _grab((F.col("nut") == "energy") & (F.col("u") == "kj")).alias("energy_kj"),
        _grab(
            F.col("nut").isin("saturated fat", "saturates") & (F.col("u") == "g")
        ).alias("satfat_g"),
        _grab((F.col("nut") == "sugars") & (F.col("u") == "g")).alias("sugars_g"),
        F.max(F.when(F.col("nut") == "salt", mg)).alias("salt_mg"),
        F.max(F.when(F.col("nut") == "sodium", mg)).alias("sodium_mg"),
        _grab((F.col("nut") == "fibre") & (F.col("u") == "g")).alias("fibre_g"),
        _grab((F.col("nut") == "protein") & (F.col("u") == "g")).alias("protein_g"),
    )
    return piv.select(
        "sku",
        "name",
        F.col("energy_kj").alias("energy_kj_per_100g"),
        F.col("satfat_g").alias("saturated_fat_g_per_100g"),
        F.col("sugars_g").alias("sugars_g_per_100g"),
        F.coalesce(F.col("salt_mg"), F.col("sodium_mg") * 2.5).alias(
            "salt_mg_per_100g"
        ),
        F.col("fibre_g").alias("fibre_g_per_100g"),
        F.col("protein_g").alias("protein_g_per_100g"),
    )


# ---------------------------------------------------------------------------
# 8. Free-From quick-check, BULK tier — generated 2000-row catalog
# ---------------------------------------------------------------------------
#
# The inline-fixture packs above prove rule arithmetic exactly but
# exercise no scan/shuffle (r2 VERDICT "weak evidence" note). This
# variant runs the SAME free-from semantics over a deterministically
# generated 2000-row catalog persisted as parquet: a real scan, a real
# explode, a real broadcast-join + aggregation — the plan shape that
# runs at 10^12 rows — while the DuckDB oracle reads the identical
# parquet and recomputes the screen from scratch.

N_CATALOG_ROWS = 2000
_CATALOG_SEED = 77


def _catalog_row(i: int) -> dict:
    import numpy as np

    rng = np.random.default_rng(_CATALOG_SEED * 65_537 + i)
    claims_all = sorted(FREE_FROM_VOCAB)
    k = 1 + int(rng.integers(0, 3))  # 1-3 claims per product
    claims = list(rng.choice(claims_all, size=k, replace=False))
    fillers = ["water", "sugar", "rice flour", "pea protein", "sunflower oil",
               "citric acid", "natural flavouring", "maltodextrin"]
    ing = list(rng.choice(fillers, size=4, replace=False))
    if i % 3 == 0:  # inject a conflict for the FIRST claim
        toks = FREE_FROM_VOCAB[claims[0]]
        ing.insert(1, toks[int(rng.integers(0, len(toks)))])
    if i % 7 == 0:  # cross-claim trap: token from an UNRELATED claim
        other = claims_all[(claims_all.index(claims[0]) + 5) % len(claims_all)]
        if other not in claims:
            ing.append(FREE_FROM_VOCAB[other][0])
    return {
        "row_id": i,
        "claims": "; ".join(claims),
        "ingredients": ", ".join(ing).title(),
    }


def _catalog_path() -> str:
    return f"/tmp/pqc_fixtures/catalog_n{N_CATALOG_ROWS}"


def _ensure_catalog(spark: SparkSession) -> str:
    import os

    from pqc.session import _ship_package

    _ship_package(spark)
    path = _catalog_path()
    if not os.path.exists(path + "/_SUCCESS"):
        from collections.abc import Iterator

        import pandas as pd

        def gen(batches: "Iterator[pd.DataFrame]"):
            for pdf in batches:
                yield pd.DataFrame([_catalog_row(int(i)) for i in pdf["id"]])

        (
            spark.range(0, N_CATALOG_ROWS, numPartitions=8)
            .mapInPandas(gen, schema="row_id long, claims string, ingredients string")
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


def _ff_bulk_oracle() -> str:
    return f"""
WITH s AS (SELECT * FROM read_parquet('{_catalog_path()}/*.parquet')),
{values_cte(_FF_DIM_ROWS, _FF_DIM_COLS, 'v')},
cl AS (
  SELECT DISTINCT row_id, trim(unnest(string_split(lower(claims), ';'))) AS claim,
         {_pad_sql("COALESCE(ingredients, '')")} AS pad
  FROM s
),
hits AS (
  SELECT cl.row_id, cl.claim, v.tok_idx, v.token
  FROM cl JOIN v ON v.claim = cl.claim
  WHERE instr(cl.pad, ' ' || v.token || ' ') > 0
),
best AS (
  SELECT row_id, claim, MIN(tok_idx) AS tok_idx FROM hits GROUP BY 1, 2
),
tok AS (
  SELECT b.row_id, b.claim, h.token
  FROM best b JOIN hits h
    ON h.row_id = b.row_id AND h.claim = b.claim AND h.tok_idx = b.tok_idx
)
SELECT cl.claim,
       CASE WHEN t.token IS NULL THEN 'ok' ELSE 'needs_review' END AS status,
       COALESCE(t.token, '') AS conflict_token,
       COUNT(*) AS n_products
FROM cl LEFT JOIN tok t ON t.row_id = cl.row_id AND t.claim = cl.claim
GROUP BY 1, 2, 3
"""


@register("free_from_bulk_screen")
def free_from_bulk_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Free-From screen over the generated 2000-row catalog parquet,
    rolled up per (claim, status, conflict_token). Same semantics as
    gluten_free_check; the plan is scan → explode → broadcast vocab
    join → two hash aggregations — every stage map-side-combined, the
    only wide shuffle keyed on (row_id, claim). The oracle is attached
    after the parquet exists (pqc/registry.py late-oracle pattern via
    module import: the path is deterministic, so the SQL embeds it)."""
    _ensure_catalog(spark)
    s = spark.read.parquet(_catalog_path())
    return (
        _free_from_screen(spark, s)
        .groupBy("claim", "status", "conflict_token")
        .agg(F.count(F.lit(1)).alias("n_products"))
    )


from pqc.registry import REGISTRY as _REG  # noqa: E402

_REG["free_from_bulk_screen"].oracle = _ff_bulk_oracle()


# ---------------------------------------------------------------------------
# 9. Gluten-Free contextual check (prompts.py:1483-1508)
# ---------------------------------------------------------------------------

# "Examples of gluten-containing ingredients" list from the prompt;
# 'malt extract' is covered by the 'malt' token (word-boundary)
GLUTEN_TOKENS = ["wheat", "rye", "barley", "oats", "spelt", "kamut",
                 "triticale", "malt", "semolina", "farro"]
# modifier phrases that clearly negate gluten content for THAT entry
GLUTEN_NEGATORS = ["gluten free", "gluten removed"]

_GC_COLS = ["row_id", "ingredients"]
GLUTEN_CTX_FIXTURE = [
    (1, "Gluten free oats, honey, salt"),            # negated → Pass
    (2, "Oats, honey, salt"),                        # plain oats → Fail
    (3, "Barley malt extract (gluten removed), sugar"),  # negated
    (4, "Wheat flour, water, yeast"),                # Fail
    (5, "Rice flour, tapioca starch, xanthan gum"),  # clean → Pass
    # negation binds to ITS entry only: the wheat entry still fails
    (6, "Gluten free oats, wheat starch"),
    (7, "Spelt and farro blend, olive oil"),         # two conflicts, one entry
    (8, "Certified gluten free oat flour"),          # negated
    (9, None),                                       # null → Pass (nothing to flag)
    (10, "Gluten-free oats, honey"),                 # hyphenated modifier negates too
]

_gc_seg_pad = _pad_sql("seg")
_GC_ORACLE = f"""
WITH {values_cte(GLUTEN_CTX_FIXTURE, _GC_COLS, 's')},
segs AS (
  SELECT row_id, trim(unnest(string_split(COALESCE(ingredients, ''), ','))) AS seg
  FROM s
),
ev AS (
  SELECT row_id, seg,
         {_any_tok_sql(_gc_seg_pad, GLUTEN_TOKENS)} AS has_gluten,
         ({" OR ".join(f"instr({_gc_seg_pad}, ' {_norm_token(p)} ') > 0" for p in GLUTEN_NEGATORS)})
           AS negated
  FROM segs WHERE length(seg) > 0
),
conf AS (
  SELECT row_id, string_agg(lower(seg), '; ' ORDER BY lower(seg)) AS conflicts,
         COUNT(*) AS n_conflicts
  FROM ev WHERE has_gluten AND NOT negated GROUP BY row_id
)
SELECT s.row_id,
       COALESCE(c.n_conflicts, 0) AS n_conflicts,
       COALESCE(c.conflicts, '') AS conflicts,
       CASE WHEN c.row_id IS NULL THEN 'Pass' ELSE 'Fail' END AS overall
FROM s LEFT JOIN conf c ON c.row_id = s.row_id
"""


@register("gluten_contextual_check", oracle=_GC_ORACLE)
def gluten_contextual_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gluten-Free CONTEXTUAL check (`prompts.py:1483-1508`), the
    deterministic core of the modifier rule: an ingredient entry with a
    gluten token is flagged UNLESS that same entry carries an explicit
    negating modifier ('gluten free oats', 'barley malt extract
    (gluten removed)') — negation binds per-entry, so 'gluten free
    oats, wheat starch' still fails on the wheat entry. Conflicts are
    reported per SKU (sorted, '; '-joined) with the Pass/Fail overall.
    Pure Catalyst: explode on commas, word-boundary token scan,
    conditional aggregation — one shuffle keyed on row_id."""
    s = spark_inline(spark, GLUTEN_CTX_FIXTURE, _GC_COLS)
    segs = s.select(
        "row_id",
        F.explode(F.split(F.coalesce("ingredients", F.lit("")), ",")).alias("seg0"),
    ).select("row_id", F.trim("seg0").alias("seg"))
    segs = segs.filter(F.length("seg") > 0)
    # negators scan the SAME punctuation-folded text as the tokens, so
    # 'gluten-free oats' negates exactly like 'gluten free oats'
    pad = _pad_col(F.col("seg"))
    neg = F.lit(False)
    for p in GLUTEN_NEGATORS:
        neg = neg | _has_tok(pad, p)
    flagged = _any_tok(pad, GLUTEN_TOKENS) & ~neg
    conf = (
        segs.filter(flagged)
        .groupBy("row_id")
        .agg(
            F.array_join(F.array_sort(F.collect_list(F.lower("seg"))), "; ").alias(
                "conflicts"
            ),
            F.count(F.lit(1)).alias("n_conflicts"),
        )
    )
    return (
        s.select("row_id")
        .join(conf, "row_id", "left")
        .select(
            "row_id",
            F.coalesce("n_conflicts", F.lit(0)).alias("n_conflicts"),
            F.coalesce("conflicts", F.lit("")).alias("conflicts"),
            F.when(F.col("conflicts").isNull(), "Pass").otherwise("Fail").alias(
                "overall"
            ),
        )
    )
