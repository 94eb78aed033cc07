"""Train the repo's pinned byte-level BPE merges table (one-off).

The table `debezium_incubator_spark/llm/bpe_merges.tsv` is CHECKED IN
— this script documents its provenance and regenerates it bit-for-bit:
plain BPE (Sennrich 2016 / GPT-2 style, public algorithm) trained on
the driver-generated sf0.001 documents corpus with fully deterministic
tie-breaks (max pair count, then lexicographically smallest pair).

Training is raw-sequence BPE (no GPT-2 regex pre-tokenization): each
document is a sequence of single-character tokens; every merge step
counts ALL adjacent pairs across the corpus, picks the winner, and
replaces its occurrences greedily left-to-right. That is exactly the
semantics `llm/bpe.py` encodes with, so the table and the encoder form
one pinned spec.

Run: python scripts/gen_bpe_merges.py [n_merges] [sf_dir]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

SEP = "\x1f"  # render-time token separator; asserted absent from corpus


def merge_pass(seq: list[str], a: str, b: str) -> list[str]:
    """Replace adjacent (a,b) with a+b, greedily left-to-right —
    the same overlap convention replace() has in Spark and DuckDB."""
    out, i, n = [], 0, len(seq)
    while i < n:
        if i + 1 < n and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def train(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    seqs = [list(t) for t in texts if t]
    merges: list[tuple[str, str]] = []
    # the chain ≡ priority-algorithm lemma (tests/test_bpe.py) needs
    # merged token STRINGS unique across merges: if ('a','bc') and
    # ('ab','c') both produced 'abc', a later pass could recreate a
    # lower-rank pair and the replace-chain would silently diverge
    # from the priority algorithm. Skip colliding candidates.
    out_strings: set[str] = set()
    for _ in range(n_merges):
        counts: Counter = Counter()
        for s in seqs:
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += 1
        if not counts:
            break
        # deterministic winner: max count, then lexicographic pair —
        # skipping any pair whose merged string was already minted
        best = None
        for pair, _c in sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        ):
            if pair[0] + pair[1] not in out_strings:
                best = pair
                break
        if best is None:
            break
        merges.append(best)
        out_strings.add(best[0] + best[1])
        seqs = [merge_pass(s, *best) for s in seqs]
    return merges


def main() -> None:
    import duckdb

    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    texts = [
        r[0]
        for r in con.execute(
            f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet') "
            f"ORDER BY doc_id"
        ).fetchall()
    ]
    joined = "".join(texts)
    assert SEP not in joined, "separator char present in corpus"
    assert "\t" not in joined and "\n" not in joined, (
        "tab/newline in corpus would break the TSV merges format"
    )
    assert "\\" not in joined, (
        "backslash in corpus: a merge token containing one would be "
        "escape-processed inside Spark's F.expr replace() literal but "
        "taken raw by DuckDB — silent cross-engine divergence"
    )
    assert "'" not in joined, "quote in corpus would break SQL literals"
    merges = train(texts, n_merges)
    out = os.path.join(
        os.path.dirname(__file__), "..",
        "debezium_incubator_spark", "llm", "bpe_merges.tsv",
    )
    with open(out, "w") as f:
        for a, b in merges:
            f.write(f"{a}\t{b}\n")
    print(f"wrote {len(merges)} merges to {os.path.abspath(out)}")
    print("last 5:", merges[-5:])


if __name__ == "__main__":
    main()
