"""Generate the checked-in WordPiece vocabulary
(debezium_incubator_spark/llm/wordpiece_vocab.tsv) from the sf0.01
corpus — deterministic, re-runnable, no RNG.

The OPERATOR under test is WordPiece greedy longest-match-first
INFERENCE (the algorithm BERT ships; HuggingFace tokenizers docs
describe it exactly): the vocabulary is a given artifact, the same way
bpe_merges.tsv is for the BPE family. This rule-built vocab is shaped
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
  longest-match must prefer the long suffix over char-by-char.

Output: one piece per line, sorted, TSV with a single column.
"""

from __future__ import annotations

import collections
import pathlib

SRC = "/root/testdata/sf0.01/documents.parquet"
OUT = (
    pathlib.Path(__file__).resolve().parent.parent
    / "debezium_incubator_spark" / "llm" / "wordpiece_vocab.tsv"
)
EXCLUDED_CHAR = "j"


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

    # invariants the engine fold and oracle CTE rely on
    assert all("\t" not in p and "\n" not in p for p in vocab)
    assert all("'" not in p and "\\" not in p for p in vocab)  # SQL-safe
    assert len({p for p in vocab}) == len(vocab)
    return sorted(vocab)


if __name__ == "__main__":
    vocab = build_vocab()
    OUT.write_text("\n".join(vocab) + "\n")
    print(f"wrote {len(vocab)} pieces to {OUT}")
