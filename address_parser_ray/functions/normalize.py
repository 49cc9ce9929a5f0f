"""Content normalization — the graft analogue of the reference's
``standardize_name`` (``fuzz/inexus_parser.py:2295-2463``): lowercase,
strip noise (there: admin-type phrases, sub-ward units, accent folding;
here: line comments, whitespace reflow) so that cosmetic variants of the
same source file shingle identically.

Vectorized with ``pyarrow.compute`` string kernels — runs zero-copy over
Arrow batches inside ``map_batches(batch_format="pyarrow")``.
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa
import pyarrow.compute as pc

# Comment noise for the langs in the corpus. pyarrow's regex engine is
# RE2 — linear-time, so the non-greedy multiline block patterns cannot
# backtrack quadratically. RE2 has no backreferences, hence one pattern
# per docstring quote style. Stripping triple-quoted literals also drops
# real string constants — the same aggressive-noise-removal trade the
# reference's standardize_name makes (inexus_parser.py:2295-2463).
_BLOCK_COMMENT_RE = r"(?s)/\*.*?\*/"          # C/JS/Go/Java/Rust
_DOCSTRING_DQ_RE = r'(?s)""".*?"""'           # Python docstrings
_DOCSTRING_SQ_RE = r"(?s)'''.*?'''"
_LINE_COMMENT_RE = r"(#|//|--)[^\n]*"


def normalize_content_arrow(
    content: pa.Array | pa.ChunkedArray,
    *,
    lowercase: bool = True,
    strip_comments: bool = True,
) -> pa.Array | pa.ChunkedArray:
    """Normalize a string column: drop block + line comments and Python
    docstrings, fold all whitespace runs to single spaces, trim,
    optionally lowercase."""
    col = content
    if strip_comments:
        col = pc.replace_substring_regex(col, pattern=_BLOCK_COMMENT_RE, replacement="")
        col = pc.replace_substring_regex(col, pattern=_DOCSTRING_DQ_RE, replacement="")
        col = pc.replace_substring_regex(col, pattern=_DOCSTRING_SQ_RE, replacement="")
        col = pc.replace_substring_regex(col, pattern=_LINE_COMMENT_RE, replacement="")
    col = pc.replace_substring_regex(col, pattern=r"\s+", replacement=" ")
    col = pc.utf8_trim_whitespace(col)
    if lowercase:
        col = pc.utf8_lower(col)
    return col


def strip_accents(text: str) -> str:
    """NFD accent fold (reference: ``ner/build_standard_dataset.py:375-387``,
    incl. đ→d). Kept for parity with the reference's normalizer family."""
    text = text.replace("đ", "d").replace("Đ", "D")
    return "".join(
        ch for ch in unicodedata.normalize("NFD", text) if unicodedata.category(ch) != "Mn"
    )


def clean_text_arrow(col, remove_slash: bool = False):
    """NBSP→space, optional '/'→space, collapse runs, trim
    (reference: ``ner/build_standard_dataset.py:410-417``)."""
    col = pc.replace_substring(col, pattern=" ", replacement=" ")
    if remove_slash:
        col = pc.replace_substring(col, pattern="/", replacement=" ")
    col = pc.replace_substring_regex(col, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(col)


def basename_arrow(path_col):
    """Last path component — the exact-key blocking feature
    (analogue of prefix-detected component keys,
    ``fuzz/inexus_parser.py:2685-2762``)."""
    return pc.replace_substring_regex(path_col, pattern=r"^.*/", replacement="")
