"""Generate the checked-in WordPiece vocabulary
(debezium_incubator_spark/llm/wordpiece_vocab.tsv) from the sf0.01
corpus — deterministic, re-runnable, no RNG. Target size: 1024 pieces
(production shape — the BPE-merges precedent at r8 #5).

The OPERATOR under test is WordPiece greedy longest-match-first
INFERENCE (the algorithm BERT ships; HuggingFace tokenizers docs
describe it exactly): the vocabulary is a given artifact, the same way
bpe_merges.tsv is for the BPE family. The corpus-mined core is shaped
to make the algorithm's branches all load-bearing on the fixture:

- single chars (initial AND '##' continuation) for every corpus
  alphabet char EXCEPT the excluded char ('j' — it occurs in exactly
  one word, 'join', which therefore tokenizes to [UNK]: the BERT
  whole-word-UNK path gets a high-frequency differential signal);
- the top-8 frequent words (len >= 4, no excluded char) as WHOLE
  pieces — greedy must pick them over their shorter prefixes;
- the 3-char prefix of every distinct word of len >= 5 as an initial
  piece — creating real prefix/whole-word competition;
- '##'+w[3:] full-suffix continuations for the top-12 words of
  len >= 5 — two-piece tokenizations (prefix + suffix) where greedy
  longest-match must prefer the long suffix over char-by-char;
- ALL corpus-attested mid-word bigrams as '##' continuations — greedy
  must prefer suffix > bigram > char at every continuation position.

The corpus has only ~31 distinct words, so corpus-attested pieces cap
out far below production vocab size. The remainder is a DETERMINISTIC
alphabet fill (sorted '##'-bigrams, then initial bigrams, then
'##'-trigrams over the 'j'-free corpus alphabet) up to exactly 1024 —
mirroring real WordPiece vocabs, where most pieces never fire on a
given document but the engine must stay fast with the full table (the
dictionary-bounded MAP literal is the size-insensitivity claim under
test). Fill pieces are all 1–3 chars, so LMAX (longest piece = the
fold's per-step branch count) is still set by the mined whole words.

Output: one piece per line, sorted, TSV with a single column.
"""

from __future__ import annotations

import collections
import itertools
import pathlib

SRC = "/root/testdata/sf0.01/documents.parquet"
OUT = (
    pathlib.Path(__file__).resolve().parent.parent
    / "debezium_incubator_spark" / "llm" / "wordpiece_vocab.tsv"
)
EXCLUDED_CHAR = "j"
TARGET = 1024


def build_vocab() -> list[str]:
    import duckdb

    rows = duckdb.connect().execute(
        f"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS w
                       FROM read_parquet('{SRC}'))
            SELECT w, count(*) AS c FROM w GROUP BY w
            ORDER BY c DESC, w"""
    ).fetchall()
    freq = collections.OrderedDict(rows)
    alphabet = sorted({ch for w in freq for ch in w})

    vocab: set[str] = set()
    for ch in alphabet:
        if ch == EXCLUDED_CHAR:
            continue
        vocab.add(ch)
        vocab.add("##" + ch)

    clean = [w for w in freq if EXCLUDED_CHAR not in w]
    whole = [w for w in clean if len(w) >= 4][:8]
    vocab.update(whole)
    for w in clean:
        if len(w) >= 5:
            vocab.add(w[:3])
    for w in [w for w in clean if len(w) >= 5][:12]:
        vocab.add("##" + w[3:])
    # corpus-attested mid-word bigram continuations
    for w in clean:
        for i in range(1, len(w) - 1):
            vocab.add("##" + w[i:i + 2])

    # deterministic alphabet fill to TARGET (production vocab shape)
    fill_alpha = [c for c in alphabet if c != EXCLUDED_CHAR]
    streams = itertools.chain(
        ("##" + a + b for a, b in itertools.product(fill_alpha, repeat=2)),
        (a + b for a, b in itertools.product(fill_alpha, repeat=2)),
        ("##" + a + b + c
         for a, b, c in itertools.product(fill_alpha, repeat=3)),
    )
    for piece in streams:
        if len(vocab) >= TARGET:
            break
        vocab.add(piece)
    assert len(vocab) == TARGET, len(vocab)

    # invariants the engine fold and oracle CTE rely on (r9 ADVICE #8:
    # the BPE uniqueness-assert pattern applied here)
    assert all(p for p in vocab), "empty piece"
    assert all("\t" not in p and "\n" not in p for p in vocab)
    assert all("'" not in p and "\\" not in p for p in vocab)  # SQL-safe
    assert "#" not in alphabet, "corpus alphabet may not contain '#'"
    for p in vocab:
        # a piece is INIT (no '##') or CONT ('##'+body, body nonempty and
        # '#'-free) — anything else makes the (pos>1 → '##'+substr)
        # matcher ambiguous across the engine fold and the oracle CTE
        body = p[2:] if p.startswith("##") else p
        assert body and "#" not in body, f"ambiguous piece {p!r}"
        assert EXCLUDED_CHAR not in body, f"excluded char in {p!r}"
    assert len({p for p in vocab}) == len(vocab)  # map keys unique
    return sorted(vocab)


if __name__ == "__main__":
    vocab = build_vocab()
    OUT.write_text("\n".join(vocab) + "\n")
    print(f"wrote {len(vocab)} pieces to {OUT}")
