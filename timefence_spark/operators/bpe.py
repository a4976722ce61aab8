"""Vendored byte-pair-encoding tokenizer — pure Python, zero dependencies.

The reference counts tokens with whatever tokenizer the deployment ships
(HF/tiktoken); this container has none, so :func:`token_count_exact`
(text.py) takes an injected ``tokenizer_fn``. This module vendors a real,
deterministic BPE so that injection point can be exercised end-to-end —
including under the DuckDB differential oracle, which replays the exact
same greedy merge loop as a recursive CTE over the same merge table
(see __spark_entry__.q_token_count_exact).

Algorithm is the classic subword BPE (Sennrich et al. 2016,
arXiv:1508.07909) with GPT-2-style rank-greedy encoding, written from the
paper's description:

* ``train_bpe`` — repeatedly merge the most frequent adjacent symbol
  pair across the training vocabulary; ties break deterministically on
  the lexicographically smallest pair, so the merge list is a pure
  function of the training text.
* ``encode`` — start from characters; repeatedly apply the best-ranked
  (earliest-learned) merge present, at its LEFTMOST occurrence, one
  merge per iteration. One-at-a-time (rather than GPT-2's
  all-occurrences-per-chosen-pair sweep) is deliberate: it is the
  formulation a SQL recursion replays naturally, and the two only
  reorder intermediate states — each iteration re-picks the global best
  rank, so the SQL and Python sides are identical BY CONSTRUCTION, not
  by a confluence argument.

``VENDORED_MERGES`` is trained at import time (microseconds) from the
fixed training text below, so the merge table is reproducible from
source; ``token_count`` is the ready-made ``tokenizer_fn``.
"""

from __future__ import annotations

from collections import Counter
from functools import lru_cache as _lru_cache

# Fixed training corpus: database/query-plan prose. Deliberately overlaps
# the synthetic documents vocabulary only PARTIALLY, so encoding real
# corpus text exercises full merges, partial merges, and bare-character
# fallback in one pass.
_TRAINING_TEXT = """
the query planner reads the table scan and pushes the filter below the
join so the scan prunes row groups early a hash join builds the small
side and probes the big side a merge join sorts both sides a window
sorts each partition an aggregate combines partial results map side
before the shuffle moves bytes across the cluster the sort spills to
disk when memory is small the stream of batches flows through the
vectorized operators and each batch holds a column of values the
customer orders table joins the lineitem table on the order key and
the group by collects the sum per key the fast path keeps data in the
cache the slow path reads from storage the planner picks the cheap plan
the window function ranks rows per partition and the filter keeps the
first row the dedup groups rows by hash value and keeps one row per
group the spark engine schedules stages and tasks the stage boundary is
a shuffle the scan reads parquet footers the sort orders the output
"""

MAX_RANK_SENTINEL = 999_999  # rank for "pair not in merge table"


def train_bpe(text: str, n_merges: int) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges from whitespace-tokenized text.

    Deterministic: the best pair maximizes frequency, ties broken by the
    lexicographically smallest (left, right) pair. Stops early when no
    adjacent pair occurs twice (merging singletons would just memorize
    the training set)."""
    vocab: Counter = Counter(
        tuple(w) for w in text.split() if w
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, freq in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged: Counter = Counter()
        for sym, freq in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            merged[tuple(out)] += freq
        vocab = merged
    return merges


VENDORED_MERGES: list[tuple[str, str]] = train_bpe(_TRAINING_TEXT, 1000)

_RANKS: dict[tuple[str, str], int] = {
    pair: rank for rank, pair in enumerate(VENDORED_MERGES)
}


def encode(word: str, ranks: dict[tuple[str, str], int] | None = None) -> list[str]:
    """Greedy rank-order BPE encoding of one word, one merge per
    iteration (best global rank, leftmost occurrence)."""
    if ranks is None:
        ranks = _RANKS
    toks = list(word)
    while len(toks) > 1:
        best_rank = MAX_RANK_SENTINEL
        best_i = -1
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]), MAX_RANK_SENTINEL)
            if r < best_rank:
                best_rank = r
                best_i = i
        if best_i < 0:
            break
        toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return toks


@_lru_cache(maxsize=1 << 16)
def _vendored_word_len(word: str) -> int:
    """Memoized per-word token count under the vendored merges: corpora
    repeat words heavily (token/type ratios in the thousands), and the
    greedy encode is O(len^2 * merges) — paying it once per TYPE instead
    of once per occurrence cuts the mapInPandas stage cost by that
    ratio. Valid only for the fixed default merge table."""
    return len(encode(word))


def token_count(text: str | None) -> int:
    """Total BPE token count of a document under the vendored merges —
    the ``tokenizer_fn`` for :func:`text.token_count_exact`."""
    if not text:
        return 0
    return sum(_vendored_word_len(w) for w in text.split() if w)
