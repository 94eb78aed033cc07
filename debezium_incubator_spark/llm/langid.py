"""Language identification (t44) — the one standard curation stage the
engine was missing: CCNet and C4 both gate on LID before any quality
rule runs, and every mixing query here (`t1`, `t23`, `t42`) consumes a
`lang` column as a given. This module PRODUCES that column.

Method: Cavnar–Trenkle n-gram rank profiles (public: Cavnar & Trenkle,
"N-Gram-Based Text Categorization", SDAIR 1994). Each language is a
ranked list of its most frequent character trigrams; a document is
scored by the "out-of-place" distance between its own trigram ranking
and each language profile (missing trigrams pay the maximum penalty);
the minimum-distance language wins.

Spark mapping — everything is builtin expressions, no UDFs:

- normalization: lowercase, spaces → ``_`` word-boundary markers,
  wrapped in ``_`` (the C–T boundary convention);
- trigram generation: ``explode(transform(sequence(...), i ->
  substring(s, i, 3)))`` — JVM-side, linear in characters (the same
  cost class as every shingle op in `dedup.py`);
- per-doc profile: one hash aggregate + one per-doc window (partition
  width = the doc's distinct-trigram count, bounded by doc length);
- scoring: the doc's top-K trigrams cross-joined with the (tiny,
  fixed) language list and left-joined onto the profile table — the
  profile is a KB control-plane literal (``N_LANGS × PROFILE_K`` rows,
  checked in below), broadcast-safe at any corpus size;
- argmin: one more per-doc aggregate with a deterministic
  (distance, lang) tie-break.

Distances are pure INTEGER arithmetic (rank differences), so the
differential oracle cannot hit a float boundary: DuckDB re-scores the
SAME profile table (inlined as a VALUES list in the oracle SQL) and
must produce bit-identical sums.

The profiles are derived at import time from the embedded seed
passages below (deterministic pure-Python fold — no RNG, no I/O). The
seeds are original text written for this repo in each language using
only letters and spaces, so the normalization pipeline is exercised
end-to-end without punctuation special-casing. Real deployments swap
in profiles trained on Wikipedia/CC samples — the table is data, not
code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import spread, table
from ..registry import register

#: profile depth (top-K trigrams per language) and doc profile depth.
#: C–T used 300 over 1–5-grams; trigrams-only at 120 keeps the oracle
#: VALUES list small while the planted-doc test still gets 4/4 recall.
PROFILE_K = 120
DOC_K = 120
#: out-of-place penalty for a doc trigram absent from a profile —
#: C–T's "maximum distance".
OOP_PENALTY = PROFILE_K

#: Seed passages (original text, letters and spaces only — the
#: normalization path needs no punctuation handling, and the planted
#: docs in tests reuse the same character set).
SEED_TEXTS = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "through the green fields while the sun is shining over the "
        "hills and the people walk to the market to buy bread and milk "
        "for their children who play in the garden near the old house "
        "with the red roof and this is the way the world goes on every "
        "day with work and rest and the small things that make life "
        "good in the morning the rain falls on the roof and the water "
        "runs down the street into the river that flows to the sea "
        "where the ships sail under the grey sky and the wind blows "
        "strong from the north bringing cold air over the town where "
        "the lights burn warm in the houses"
    ),
    "fr": (
        "le renard brun saute par dessus le chien paresseux et puis il "
        "court à travers les champs verts pendant que le soleil brille "
        "sur les collines et les gens marchent au marché pour acheter "
        "du pain et du lait pour leurs enfants qui jouent dans le "
        "jardin près de la vieille maison avec le toit rouge et ainsi "
        "le monde continue chaque jour avec le travail et le repos et "
        "les petites choses qui rendent la vie belle le matin la pluie "
        "tombe sur le toit et elle coule dans la rue vers la rivière "
        "qui descend vers la mer où les bateaux naviguent sous le ciel "
        "gris et le vent souffle fort du nord apportant du froid sur "
        "la ville où les lumières brillent dans les maisons"
    ),
    "es": (
        "el zorro marrón salta sobre el perro perezoso y luego corre "
        "por los campos verdes mientras el sol brilla sobre las "
        "colinas y la gente camina al mercado para comprar pan y leche "
        "para sus hijos que juegan en el jardín cerca de la casa vieja "
        "con el techo rojo y así es como el mundo sigue cada día con "
        "trabajo y descanso y las pequeñas cosas que hacen buena la "
        "vida por la mañana la lluvia cae sobre el techo y el agua "
        "corre por la calle hacia el río que baja hacia el mar donde "
        "los barcos navegan bajo el cielo gris y el viento sopla "
        "fuerte desde el norte trayendo frío sobre el pueblo donde las "
        "luces arden en las casas"
    ),
    "de": (
        "der braune fuchs springt über den faulen hund und dann läuft "
        "er durch die grünen felder während die sonne über den hügeln "
        "scheint und die leute gehen zum markt um brot und milch für "
        "ihre kinder zu kaufen die im garten nahe dem alten haus mit "
        "dem roten dach spielen und so geht die welt jeden tag weiter "
        "mit arbeit und ruhe und den kleinen dingen die das leben gut "
        "machen am morgen fällt der regen auf das dach und das wasser "
        "läuft die strasse hinunter in den fluss der zum meer fliesst "
        "wo die schiffe unter dem grauen himmel segeln und der wind "
        "stark aus dem norden weht und kalte luft über die stadt "
        "bringt wo die lichter warm in den häusern brennen"
    ),
    # round-10 breadth (r9 verdict #7): three more public-seed
    # languages, including the es/pt/it romance cluster — the pair
    # most likely to confuse a trigram profiler — so the confusion-
    # pinning test has real adversaries. Apostrophes are deliberately
    # avoided (profile trigrams inline into the oracle VALUES list).
    "it": (
        "la volpe marrone salta sopra il cane pigro e poi corre "
        "attraverso i campi verdi mentre il sole brilla sulle colline "
        "e la gente cammina al mercato per comprare pane e latte per "
        "i loro bambini che giocano nel giardino vicino alla vecchia "
        "casa con il tetto rosso e così il mondo va avanti ogni "
        "giorno con il lavoro e il riposo e le piccole cose che "
        "rendono buona la vita al mattino la pioggia cade sul tetto e "
        "la acqua scorre lungo la strada verso il fiume che scende "
        "verso il mare dove le navi navigano sotto il cielo grigio e "
        "il vento soffia forte dal nord portando aria fredda sulla "
        "città dove le luci ardono calde nelle case"
    ),
    "nl": (
        "de bruine vos springt over de luie hond en dan rent hij door "
        "de groene velden terwijl de zon over de heuvels schijnt en "
        "de mensen lopen naar de markt om brood en melk te kopen voor "
        "hun kinderen die in de tuin spelen bij het oude huis met het "
        "rode dak en zo gaat de wereld elke dag verder met werk en "
        "rust en de kleine dingen die het leven goed maken in de "
        "ochtend valt de regen op het dak en het water loopt de "
        "straat af naar de rivier die naar de zee stroomt waar de "
        "schepen onder de grijze lucht varen en de wind sterk uit het "
        "noorden waait en koude lucht over de stad brengt waar de "
        "lichten warm in de huizen branden"
    ),
    "pt": (
        "a raposa marrom salta sobre o cão preguiçoso e depois corre "
        "pelos campos verdes enquanto o sol brilha sobre as colinas e "
        "as pessoas caminham ao mercado para comprar pão e leite para "
        "os seus filhos que brincam no jardim perto da casa velha com "
        "o telhado vermelho e assim o mundo segue cada dia com "
        "trabalho e descanso e as pequenas coisas que tornam a vida "
        "boa pela manhã a chuva cai sobre o telhado e a água corre "
        "pela rua até o rio que desce até o mar onde os barcos "
        "navegam sob o céu cinzento e o vento sopra forte do norte "
        "trazendo frio sobre a cidade onde as luzes ardem quentes "
        "nas casas"
    ),
}


def _normalize_py(text: str) -> str:
    """The Python twin of the engine normalization (profiles must be
    built with EXACTLY the scoring pipeline's view of text)."""
    return "_" + text.lower().replace(" ", "_") + "_"


def _rank_trigrams(text: str, k: int) -> list[tuple[str, int]]:
    """Top-k trigrams of ``text`` ranked 1..k by (count desc, trigram
    asc) — the same deterministic tie-break the engine and oracle use."""
    s = _normalize_py(text)
    counts: dict[str, int] = {}
    for i in range(len(s) - 2):
        tg = s[i:i + 3]
        counts[tg] = counts.get(tg, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(tg, r + 1) for r, (tg, _) in enumerate(ranked)]


def build_profiles(k: int = PROFILE_K) -> list[tuple[str, str, int]]:
    """(lang, trigram, rank) rows for every seed language — the
    control-plane profile table (KB-sized: len(SEED_TEXTS)·k rows)."""
    rows = []
    for lang in sorted(SEED_TEXTS):
        for tg, r in _rank_trigrams(SEED_TEXTS[lang], k):
            rows.append((lang, tg, r))
    return rows


PROFILES = build_profiles()


def _norm_col(text_col) -> F.Column:
    return F.concat(
        F.lit("_"), F.translate(F.lower(text_col), " ", "_"), F.lit("_")
    )


def language_id(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    profiles: list[tuple[str, str, int]] | None = None,
    doc_k: int = DOC_K,
    penalty: int = OOP_PENALTY,
) -> DataFrame:
    """Predict a language per document: returns
    ``(id_col, pred_lang, dist)`` with ``dist`` the winning profile's
    out-of-place distance (BIGINT — pure rank arithmetic).

    Scale: trigram explode is linear in characters; the doc-profile
    window partitions by document (width ≤ doc length); the profile
    join side is the control-plane literal (bounded: N_LANGS × K rows
    — genuinely broadcastable at any corpus size, unlike a derived
    vocabulary); the argmin is one more per-doc aggregate. Documents
    shorter than 3 normalized characters produce no trigrams and are
    absent from the output (no language evidence — both engines drop
    them identically)."""
    spark = docs.sparkSession
    prof = spark.createDataFrame(
        profiles if profiles is not None else PROFILES,
        "lang STRING, tg STRING, pr INT",
    )
    langs = prof.select("lang").distinct()

    # round-13: the trigram transform+explode is compute-bound and the
    # docs scan is one split at bench SFs — widen first (no-op at
    # production split counts; guide §2.5 / the repo's spread rule)
    s = spread(docs).select(F.col(id_col), _norm_col(F.col(text_col)).alias("s"))
    # guard: Spark's sequence(1, n) DESCENDS when n < 1 (sequence(1,0)
    # = [1, 0]), so a <3-char doc would mint phantom trigrams the
    # oracle's range(1, len-1) (empty when len < 3) never sees —
    # cross-engine divergence on degenerate docs without the CASE
    tgs = s.select(
        id_col,
        F.explode(
            F.expr(
                "CASE WHEN length(s) >= 3 THEN "
                "transform(sequence(1, length(s) - 2), i -> substring(s, i, 3)) "
                "ELSE array() END"
            )
        ).alias("tg"),
    )
    cnt = tgs.groupBy(id_col, "tg").agg(F.count("*").alias("c"))
    rk = cnt.withColumn(
        "r",
        F.row_number().over(
            W.partitionBy(id_col).orderBy(F.desc("c"), F.asc("tg"))
        ),
    ).filter(F.col("r") <= doc_k)
    # profile table is the bounded control-plane literal — broadcast
    scored = (
        rk.alias("d")
        .crossJoin(F.broadcast(langs.alias("l")))
        .join(
            F.broadcast(prof.alias("p")),
            on=(F.col("p.lang") == F.col("l.lang"))
            & (F.col("p.tg") == F.col("d.tg")),
            how="left_outer",
        )
        .select(
            F.col(f"d.{id_col}").alias(id_col),
            F.col("l.lang").alias("cand"),
            F.coalesce(
                F.abs(F.col("d.r") - F.col("p.pr")).cast("long"),
                F.lit(int(penalty)).cast("long"),
            ).alias("oop"),
        )
    )
    dist = scored.groupBy(id_col, "cand").agg(
        F.sum("oop").cast("long").alias("dist")
    )
    best = dist.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy(id_col).orderBy(F.asc("dist"), F.asc("cand"))
        ),
    ).filter(F.col("rn") == 1)
    return best.select(
        id_col, F.col("cand").alias("pred_lang"), "dist"
    )


def _profile_values_sql() -> str:
    """The profile table as a SQL VALUES list (oracle twin input)."""
    rows = ", ".join(
        f"('{lang}', '{tg}', {pr})" for lang, tg, pr in PROFILES
    )
    return rows


def oracle_lid_cte(cte_name: str = "lid") -> str:
    """DuckDB WITH-clause body re-deriving per-doc LID from scratch
    (profiles inlined as VALUES). The final CTE ``cte_name`` holds
    (doc_id, pred_lang, dist) — reusable by composed oracles (t48/t49)
    exactly like ``bpe.oracle_docs_with_counts``."""
    return f"""prof(lang, tg, pr) AS (VALUES {_profile_values_sql()}),
langs AS (SELECT DISTINCT lang FROM prof),
norm AS (
  SELECT doc_id, '_' || replace(lower(text), ' ', '_') || '_' AS s
  FROM documents
),
tgs AS (
  SELECT doc_id, substr(s, CAST(i AS INT), 3) AS tg
  FROM norm, unnest(range(1, length(s) - 1)) AS t(i)
),
cnt AS (SELECT doc_id, tg, count(*) AS c FROM tgs GROUP BY doc_id, tg),
rk AS (
  SELECT doc_id, tg,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, tg)
           AS r
  FROM cnt
),
top AS (SELECT * FROM rk WHERE r <= {DOC_K}),
dist AS (
  SELECT t.doc_id, l.lang AS cand,
         CAST(SUM(COALESCE(ABS(t.r - p.pr), {OOP_PENALTY})) AS BIGINT)
           AS dist
  FROM top t CROSS JOIN langs l
  LEFT JOIN prof p ON p.lang = l.lang AND p.tg = t.tg
  GROUP BY t.doc_id, l.lang
),
best AS (
  SELECT doc_id, cand AS pred_lang, dist,
         row_number() OVER (PARTITION BY doc_id ORDER BY dist, cand)
           AS rn
  FROM dist
),
{cte_name} AS (SELECT doc_id, pred_lang, dist FROM best WHERE rn = 1)"""


_T44_ORACLE = f"""
WITH {oracle_lid_cte()}
SELECT doc_id, pred_lang, dist FROM lid ORDER BY doc_id
"""


@register("t44_language_id", oracle=_T44_ORACLE)
def t44_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cavnar–Trenkle LID over the documents table: per-doc predicted
    language + out-of-place distance against the embedded profiles.
    The synthetic fixture's text is an English-like token soup under
    every `lang` label, so predictions skew `en` — the DIFFERENTIAL is
    the point here (bit-identical integer rank arithmetic across
    engines over the full explode→rank→score→argmin funnel); actual
    multilingual recall is pinned by the planted-doc test in
    tests/test_langid.py."""
    d = table(spark, sf_dir, "documents")
    # un-movable sort: the trailing sort's sampler re-runs the per-doc
    # argmin window above the last exchange; output is one row per doc
    return language_id(d).localCheckpoint(eager=False).orderBy("doc_id")
