"""Snippet generation + highlight — reference Q8, the 181-line behavioral
surface of services/LemmasFinder.java:72-252 re-expressed as a pure Python
function (driver/presentation path; runs only on the ≤limit result rows).

Semantics replicated exactly (all citations into /root/reference):

* text splits into lines on ``[\\r\\n]+``; blank lines skipped; fragments
  never cross line boundaries (LemmasFinder.java:80-89).
* each line splits into words on whitespace incl. NBSP (``[\\u00a0\\s]+``,
  LemmasFinder.java:108).
* a word is *significant* if, after boundary-symbol cleanup (same rule as
  the tokenizer T3 but case-preserving), it is a valid letter-word and not a
  stop-POS word (isFittingWord, LemmasFinder.java:299-316 — our frozen
  stopword list stands in for the PARTICLES tag classes).
* a significant word whose normal form (textproc/lemmas.py) is in the query
  lemma set is a *match*: wrapped in ``<b>…</b>`` preserving original case
  and any non-letter prefix/suffix kept outside the tag
  (addLemmaWord, LemmasFinder.java:148-176).
* adjacent matches merge into one ``<b>`` block: the previous closing tag is
  removed when the preceding word was also a match (LemmasFinder.java:161-167).
* up to ``words_range`` (default 2, config/SearchSettings.java:13)
  significant words of context are emitted left/right of each match;
  ``...`` separates non-adjacent fragments (correctFragmentLeftBoundary /
  correctFragmentRightBoundary, LemmasFinder.java:185-244); a trailing
  `` ...`` closes a line whose tail was truncated (correctSnippetEnd,
  LemmasFinder.java:246-252).
* once the snippet exceeds 270 chars, the remainder is wrapped in a
  ``<details>`` spoiler closed at the end (checkAndAddSpoiler,
  LemmasFinder.java:177-183; README.md:242).
"""

from __future__ import annotations

import re

from .lemmas import lemma
from .stopwords import STOPWORDS
from .tokenize import LETTER

WORDS_RANGE_DEFAULT = 2
SPOILER_THRESHOLD = 270

_LINES_RE = re.compile(r"[\r\n]+")
_WORDS_RE = re.compile("[\u00a0\\s]+")
# case-insensitive versions of the tokenizer's boundary/word rules (the
# snippet path preserves original case; validity is checked on .lower())
_BOUNDARY_STRIP_CI_RE = re.compile(f"^[^{LETTER}0-9]+|[^{LETTER}0-9]+$", re.IGNORECASE)
_WORD_CI_RE = re.compile(f"^[{LETTER}]+(-[{LETTER}]+)*$", re.IGNORECASE)


def _clean_word(word: str) -> str:
    return _BOUNDARY_STRIP_CI_RE.sub("", word)


def _is_fitting(cleaned: str) -> bool:
    if not cleaned or not _WORD_CI_RE.match(cleaned):
        return False
    return cleaned.lower() not in STOPWORDS


def build_snippet(
    text: str,
    lemmas: set[str],
    words_range: int = WORDS_RANGE_DEFAULT,
) -> str:
    """Reference getSnippet(): highlighted multi-fragment snippet string."""
    if not text or not text.strip():
        return ""
    parts: list[str] = []  # joined at the end; managed like the StringBuilder
    spoiler = False
    for line in _LINES_RE.split(text):
        if not line.strip():
            continue
        spoiler = _add_line(line.strip(), lemmas, parts, spoiler, words_range)
    if spoiler:
        parts.append("</details>")
    return "".join(parts).strip()


def _snippet_len(parts: list[str]) -> int:
    return sum(len(p) for p in parts)


def _ends_with(parts: list[str], suffix: str) -> bool:
    tail = "".join(parts)[-len(suffix):] if parts else ""
    return tail == suffix


def _add_line(
    line: str,
    lemmas: set[str],
    parts: list[str],
    spoiler: bool,
    words_range: int,
) -> bool:
    """addLineToSnippet (LemmasFinder.java:101-146)."""
    words = _WORDS_RE.split(line)
    sig_indexes: list[int] = []  # original indices of significant words
    last_lemma_sig = -1  # index INTO sig_indexes of the last match
    last_word_idx = -1  # last original word index already emitted

    for i, word in enumerate(words):
        cleaned = _clean_word(word)
        if not _is_fitting(cleaned):
            continue
        sig_pos = len(sig_indexes)
        sig_indexes.append(i)
        if lemma(cleaned.lower()) not in lemmas:
            last_word_idx = _right_boundary(
                parts, last_lemma_sig, sig_indexes, last_word_idx, i, words,
                words_range,
            )
            continue
        # a new match
        if _snippet_len(parts) > SPOILER_THRESHOLD and not spoiler:
            parts.append("<details>")
            spoiler = True
        merge_ok = _left_boundary(
            parts, last_lemma_sig, i, last_word_idx, sig_indexes, words,
            words_range,
        )
        _add_match(parts, last_lemma_sig, i, sig_indexes, words, cleaned, merge_ok)
        last_word_idx = i
        last_lemma_sig = sig_pos

    _close_line(parts, last_word_idx, words)
    return spoiler


def _left_boundary(
    parts: list[str],
    last_lemma_sig: int,
    i: int,
    last_word_idx: int,
    sig_indexes: list[int],
    words: list[str],
    words_range: int,
) -> bool:
    """correctFragmentLeftBoundary (LemmasFinder.java:185-215): emit up to
    words_range significant-word context before the match; returns whether an
    adjacent-<b> merge is still possible."""
    merge_ok = True
    if i < 1:
        return merge_ok
    if last_lemma_sig == -1 and not (
        _snippet_len(parts) >= 3 and _ends_with(parts, "...")
    ):
        parts.append("...")
    if last_word_idx < i - 1:
        merge_ok = False
        sig_pos = len(sig_indexes) - 1
        prev = sig_indexes[max(sig_pos - words_range, 0)]
        if last_word_idx >= 0:
            prev = max(last_word_idx + 1, prev)
        for j in range(prev, i):
            parts.append(" " + words[j])
    return merge_ok


def _right_boundary(
    parts: list[str],
    last_lemma_sig: int,
    sig_indexes: list[int],
    last_word_idx: int,
    i: int,
    words: list[str],
    words_range: int,
) -> int:
    """correctFragmentRightBoundary (LemmasFinder.java:217-244): emit up to
    words_range significant words after the previous match, then ' ...'."""
    if last_lemma_sig == -1:
        return last_word_idx
    sig_pos = len(sig_indexes) - 1
    end_sig = last_lemma_sig + words_range
    if sig_pos <= end_sig:
        start = max(sig_indexes[last_lemma_sig], last_word_idx) + 1
        for j in range(start, i + 1):
            parts.append(" " + words[j])
        last_word_idx = i
    elif sig_pos == end_sig + 1:
        parts.append(" ...")
    return last_word_idx


def _add_match(
    parts: list[str],
    last_lemma_sig: int,
    i: int,
    sig_indexes: list[int],
    words: list[str],
    cleaned: str,
    merge_ok: bool,
) -> None:
    """addLemmaWord (LemmasFinder.java:148-176): '<b>word</b>' with original
    punctuation outside the tag; merges adjacent match blocks."""
    snap_len = _snippet_len(parts)  # length BEFORE the separating space
    merge_ok = merge_ok and snap_len >= 7 and last_lemma_sig >= 0
    parts.append(" ")
    word = words[i]
    prefix_end = word.find(cleaned)
    if prefix_end > 0:
        parts.append(word[:prefix_end])
        merge_ok = False
    if merge_ok and sig_indexes[last_lemma_sig] == i - 1:
        # continue the open <b> block: remove the 4 chars just before the
        # separating space — normally the prior '</b>'. The reference
        # removes them UNconditionally (StringBuilder.replace,
        # LemmasFinder.java:163-165), even when a '<details>' spoiler or a
        # punctuation suffix landed there; we replicate that quirk
        # bug-for-bug to stay output-identical.
        joined = "".join(parts)
        parts[:] = [joined[: snap_len - 4] + joined[snap_len:]]
    else:
        parts.append("<b>")
    parts.append(cleaned)
    parts.append("</b>")
    postfix_start = prefix_end + len(cleaned)
    if postfix_start < len(word):
        parts.append(word[postfix_start:])


def _close_line(parts: list[str], last_word_idx: int, words: list[str]) -> None:
    """correctSnippetEnd (LemmasFinder.java:246-252)."""
    if (
        last_word_idx != len(words) - 1
        and _snippet_len(parts) >= 3
        and not _ends_with(parts, "...")
    ):
        parts.append(" ...")
