"""Generate the checked-in unigram-LM vocabulary
(debezium_incubator_spark/llm/unigram_vocab.tsv) — deterministic,
re-runnable, no RNG. Two-column TSV: ``piece<TAB>nll`` where nll is
the INTEGER fixed-point negative log-likelihood (the t58 quantization:
floor(ln((total+V)/(cnt+1))·1e6 + 0.5)) — inference consumes only
integers, so the t59 operator carries ZERO floats end-to-end.

The OPERATOR under test is unigram-LM VITERBI inference (the
SentencePiece runtime: given piece costs, segment each word by the
minimum-cost path — Kudo 2018). The vocabulary is a given artifact,
exactly like ``bpe_merges.tsv`` (BPE) and ``wordpiece_vocab.tsv``
(WordPiece): this script mines the CORE from the corpus by running the
pure-Python hard-EM trainer (the same reference semantics
tests/test_unigram_train.py pins against the distributed t58 trainer),
then pads to exactly 1024 pieces with a DETERMINISTIC alphabet fill at
a uniform high cost — the production-vocab-size shape (most pieces
never win on a given document, but they all participate as DP
candidates, so the size-insensitivity of the vocab-as-DATA map is
load-bearing).

Why the fill cost matters: fill bigrams/trigrams over the corpus
alphabet DO match corpus substrings, so they are live Viterbi
candidates on every word — at CORE_MAX_NLL + 1e6 they lose to the
EM-derived pieces on real words but still beat the per-char UNK
fallback (UNK_NLL), making three cost tiers the DP must order
correctly: core < fill < unknown-char.
"""

from __future__ import annotations

import collections
import itertools
import math
import pathlib

import duckdb

SRC = "/root/testdata/sf0.01/documents.parquet"
OUT = (
    pathlib.Path(__file__).resolve().parent.parent
    / "debezium_incubator_spark" / "llm" / "unigram_vocab.tsv"
)

PLEN = 6       # max piece length the trainer seeds (=> inference LMAX)
SEED_N = 2048  # multi-char seed cap (far above this corpus's pool)
ROUNDS = 4
TARGET = 1024  # padded vocab size
FILL_EXTRA = 1_000_000  # fill tier sits this far above the core max

# CORPUS CAPACITY (measured, round 12 — the r11 #5 "mine the full 1024
# competitively" ask): the synthetic documents fixture has exactly
# 31 DISTINCT WORDS at every SF (the generator's vocabulary), a
# 24-char alphabet, and a TOTAL multi-char substring pool of 238 —
# 262 expressible pieces in the whole piece space. 1024 competitive
# pieces therefore have no referent on this corpus; hard-EM converges
# to 31 winner pieces (every word its own best piece where len ≤ PLEN)
# + alphabet. The round-12 artifact instead trains the ENTIRE
# expressible pool: keep-all retention (prune_unused=False — the same
# trainer, unused pieces retained at count 0) gives every one of the
# 262 real pieces a TRAINED cost — winners at their count-derived
# NLLs, never-used substrings at the EM's own uniform zero-count tier
# ln(t+V) — and only the pad beyond 262 is synthetic: alphabet
# combinations that are NOT substrings of any corpus word, i.e.
# provably DEAD DP candidates, present purely to exercise
# vocab-size-insensitivity of the vocab-as-DATA map at the
# production-shape 1024.


def ref_unigram(texts, rounds=ROUNDS, plen=PLEN, seed_n=SEED_N,
                prune_unused=True):
    """The t58 reference trainer (tests/test_unigram_train.py), with
    the final-round NLLs returned alongside the final counts.
    ``prune_unused=False`` = keep-all retention (unigram_train.em_round
    docstring): unused multi-char pieces stay at count 0."""
    wf = collections.Counter(
        w for t in texts for w in t.split(" ") if w
    )
    seed: collections.Counter = collections.Counter()
    for w, f in wf.items():
        for s in range(len(w)):
            for ln in range(1, min(plen, len(w) - s) + 1):
                seed[w[s:s + ln]] += f
    vocab = {p: c for p, c in seed.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_n]
    vocab.update(dict(multi))
    for _ in range(rounds):
        t, v = sum(vocab.values()), len(vocab)
        nll = {
            p: math.floor(math.log((t + v) / (c + 1)) * 1000000.0 + 0.5)
            for p, c in vocab.items()
        }
        nc: collections.Counter = collections.Counter()
        for w, f in wf.items():
            acc = [(0, 0, -1)]
            for i in range(1, len(w) + 1):
                cands = [
                    (acc[j][0] + nll[w[j:i]], acc[j][1] + 1, j)
                    for j in range(max(0, i - plen), i)
                    if w[j:i] in nll
                ]
                acc.append(min(cands))
            i = len(w)
            while i > 0:
                bp = acc[i][2]
                nc[w[bp:i]] += f
                i = bp
        nxt = {p: nc.get(p, 0) for p in vocab if len(p) == 1}
        if prune_unused:
            nxt.update(
                {p: nc[p] for p in vocab
                 if len(p) >= 2 and nc.get(p, 0) >= 1}
            )
        else:
            nxt.update(
                {p: nc.get(p, 0) for p in vocab if len(p) >= 2}
            )
        vocab = nxt
    # final NLLs from the final counts — what inference will pay
    t, v = sum(vocab.values()), len(vocab)
    return {
        p: math.floor(math.log((t + v) / (c + 1)) * 1000000.0 + 0.5)
        for p, c in vocab.items()
    }


def main() -> None:
    texts = [
        r[0]
        for r in duckdb.connect()
        .execute(f"SELECT text FROM read_parquet('{SRC}')")
        .fetchall()
    ]
    # keep-all retention: EVERY expressible piece ends with a trained
    # cost (corpus-capacity comment above) — the seed cap is far above
    # the measured 238-piece pool, so nothing real is cut
    core = ref_unigram(texts, prune_unused=False)
    alphabet = sorted({c for t in texts for c in t if c != " "})
    assert all(c in core for c in alphabet), "trainer must keep chars"
    n_winners = sum(1 for p, n in core.items()
                    if n < max(core.values()))
    fill_nll = max(core.values()) + FILL_EXTRA
    vocab = dict(core)
    # deterministic pad to the production-shape TARGET: sorted alphabet
    # bigrams, then trigrams, skipping everything already trained — by
    # construction every pad piece is NOT a substring of any corpus
    # word (the trained core contains ALL substrings), so pads are
    # dead DP candidates at a cost above every trained tier
    for size in (2, 3):
        for tup in itertools.product(alphabet, repeat=size):
            if len(vocab) >= TARGET:
                break
            p = "".join(tup)
            if p not in vocab:
                vocab[p] = fill_nll
        if len(vocab) >= TARGET:
            break
    assert len(vocab) == TARGET, f"only {len(vocab)} pieces"
    for p in vocab:
        # SQL-safety: the oracle inlines pieces in a VALUES list
        assert p.isascii() and "'" not in p and "\\" not in p, p
        assert "\t" not in p and "\n" not in p and p == p.strip(), p
    assert len(set(vocab)) == len(vocab)
    with open(OUT, "w") as f:
        for p in sorted(vocab):
            f.write(f"{p}\t{vocab[p]}\n")
    print(f"wrote {len(vocab)} pieces to {OUT}; trained core "
          f"{len(core)} (winners {n_winners}, zero-count tier "
          f"{len(core) - n_winners}), dead pad {TARGET - len(core)}, "
          f"fill_nll {fill_nll}")


if __name__ == "__main__":
    main()
