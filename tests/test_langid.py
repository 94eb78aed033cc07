"""Language identification (t44): planted multilingual recall, profile
shape, determinism, and short-doc edge cases. The differential parity
of the registered query is covered by the oracle sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_incubator_spark.llm.langid import (
    DOC_K,
    OOP_PENALTY,
    PROFILE_K,
    PROFILES,
    SEED_TEXTS,
    _rank_trigrams,
    build_profiles,
    language_id,
)

# held-out sentences (NOT in the seed passages) per language — written
# with the same letters-and-spaces convention as the seeds
PLANTED = {
    "en": "she gave the children some water and they thanked her "
          "before walking home through the quiet evening streets",
    "fr": "elle donna de la soupe aux enfants et ils la remercièrent "
          "avant de rentrer chez eux par les rues calmes du soir",
    "es": "ella dio agua a los niños y ellos le dieron las gracias "
          "antes de caminar a casa por las calles tranquilas",
    "de": "sie gab den kindern etwas wasser und sie dankten ihr bevor "
          "sie durch die stillen strassen nach hause gingen",
    "it": "lei diede un poco di acqua ai bambini e loro la "
          "ringraziarono prima di tornare a casa per le strade "
          "tranquille della sera",
    "nl": "zij gaf de kinderen wat water en zij bedankten haar "
          "voordat zij door de stille straten naar huis liepen",
    "pt": "ela deu um pouco de água às crianças e elas agradeceram "
          "antes de caminhar para casa pelas ruas tranquilas da "
          "noite",
}


def test_profile_table_shape():
    """Every language contributes exactly PROFILE_K ranked trigrams,
    ranks are 1..K contiguous, and (lang, tg) pairs are unique."""
    langs = sorted(SEED_TEXTS)
    assert len(PROFILES) == len(langs) * PROFILE_K
    assert len({(lg, tg) for lg, tg, _ in PROFILES}) == len(PROFILES)
    for lang in langs:
        ranks = sorted(pr for lg, _, pr in PROFILES if lg == lang)
        assert ranks == list(range(1, PROFILE_K + 1))


def test_profiles_sql_safe():
    """Profile trigrams are inlined into the oracle's VALUES list as
    single-quoted literals — no quote or escape character may appear
    (same class of guard as the BPE merges-table corpus assertions)."""
    for _, tg, _ in PROFILES:
        assert "'" not in tg and "\\" not in tg and len(tg) == 3


def test_build_is_deterministic():
    assert build_profiles() == PROFILES
    assert _rank_trigrams("aaab aaab", 5) == _rank_trigrams("aaab aaab", 5)


def test_planted_multilingual_recall(spark):
    """Held-out sentences in each profiled language must all come back
    with the right prediction — 7/7 recall, pinned exactly."""
    assert set(PLANTED) == set(SEED_TEXTS)  # breadth stays in sync
    rows = [(i, PLANTED[lang], lang)
            for i, lang in enumerate(sorted(PLANTED))]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, want STRING")
    got = {
        r["doc_id"]: r["pred_lang"]
        for r in language_id(df).collect()
    }
    want = {i: lang for i, lang in enumerate(sorted(PLANTED))}
    assert got == want


def test_romance_cluster_confusion_margin(spark):
    """Confusion pinning for the adversarial es/pt/it cluster (and
    fr): each planted romance-language doc must beat every OTHER
    romance profile by a strictly positive margin — not just win the
    argmin. A trigram profiler that merely ekes out ties here would
    be fragile; this pins real separation on held-out text."""
    romance = ["es", "fr", "it", "pt"]
    rows = [(i, PLANTED[lang]) for i, lang in enumerate(romance)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    # full per-candidate distances: rerun scoring with each single-
    # language profile subset (the public API only surfaces argmin)
    full = {}
    for cand in romance:
        prof = [(lg, tg, pr) for lg, tg, pr in PROFILES if lg == cand]
        for r in language_id(df, profiles=prof).collect():
            full[(r["doc_id"], cand)] = r["dist"]
    for i, lang in enumerate(romance):
        own = full[(i, lang)]
        for other in romance:
            if other != lang:
                assert own < full[(i, other)], (
                    f"{lang} planted doc does not separate from {other}: "
                    f"{own} vs {full[(i, other)]}"
                )


def test_seed_texts_self_identify(spark):
    """Each seed passage scores its own profile at distance far below
    every other language (sanity: the profiles separate)."""
    rows = [(i, SEED_TEXTS[lang]) for i, lang in enumerate(sorted(SEED_TEXTS))]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    preds = language_id(df).collect()
    assert [r["pred_lang"] for r in sorted(preds, key=lambda r: r["doc_id"])] \
        == sorted(SEED_TEXTS)


def test_short_doc_dropped(spark):
    """A doc with <3 normalized chars yields no trigrams → absent from
    the output (no evidence, both engines drop identically); a doc of
    exactly 1 char still normalizes to 3 chars (_x_) and scores."""
    df = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "the cat sat")],
        "doc_id LONG, text STRING",
    )
    out = language_id(df).collect()
    ids = {r["doc_id"] for r in out}
    assert 3 in ids and 2 in ids  # "a" → "_a_": one trigram, scores
    assert 1 not in ids           # "" → "__": no trigram


def test_unknown_trigrams_pay_max_penalty(spark):
    """A doc sharing NOTHING with any profile scores exactly
    n_trigrams·PENALTY for every language (ties broken to the
    alphabetically first lang) — pins the out-of-place arithmetic."""
    df = spark.createDataFrame([(1, "zzqzzqzzq")], "doc_id LONG, text STRING")
    out = language_id(df).collect()
    assert len(out) == 1
    r = out[0]
    # "_zzqzzqzzq_": 11 chars → 9 trigrams, 5 distinct (zzq, zqz, qzz,
    # _zz, zq_) — check against the real distinct count to keep the
    # assertion honest
    s = "_zzqzzqzzq_"
    n_distinct = len({s[i:i + 3] for i in range(len(s) - 2)})
    assert r["dist"] == n_distinct * OOP_PENALTY
    assert r["pred_lang"] == "de"  # alphabetical tie-break


def test_doc_k_cap_applies(spark):
    """A long doc contributes at most DOC_K ranked trigrams to the
    distance — dist can never exceed DOC_K·PENALTY."""
    long_text = " ".join(
        f"{a}{b}{c}" for a in "qxz" for b in "qxz" for c in "qxzjv"
    ) * 20
    df = spark.createDataFrame([(1, long_text)], "doc_id LONG, text STRING")
    r = language_id(df).collect()[0]
    assert r["dist"] <= DOC_K * OOP_PENALTY
