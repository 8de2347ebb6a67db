"""Text normalization + content-key scalar functions (all native Catalyst exprs).

Reference parity map (file:line in /root/reference/):
- placeholder set  — database.py:364,727 (text rows excluded from matching)
- whitespace strip — database.py:45-46 (``canonical``, intended) and :126
  (the OCR path actually does it). We apply it to MATCH KEYS only; stored
  turn text is never mutated (per-turn text-equality invariant).
- content digest   — replaces the reference's polymorphic ``Content`` equality
  probe (database.py:365-377) with an explicit sha256 over the normalized doc.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: texts that never participate in matching (database.py:364).
PLACEHOLDER_TEXTS = ("&#x200B;", "", "[removed]", "[deleted]")


def normalize_ws(col: Column | str) -> Column:
    """Strip ALL whitespace (reference ``canonical``/OCR normalization).

    ``translate`` with the exact Java-regex ``\\s`` character class
    [ \\t\\n\\x0B\\f\\r] — value-identical to ``regexp_replace(col, '\\s+',
    '')`` (the formula the DuckDB oracles state) but a plain char-map scan
    instead of a regex engine pass: measured ~3× cheaper on multi-KB docs,
    and assembly is bandwidth-bound at high core counts so every byte pass
    counts."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, " \t\n\x0b\f\r", "")


def is_placeholder(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | c.isin(*PLACEHOLDER_TEXTS)


def doc_sha(col: Column | str) -> Column:
    """Exact-match key: sha256 of the whitespace-stripped document.

    Equality on this column ≙ the reference's exact ``Content = ?`` probe
    (database.py:365-377) emitting 100%-score matches.
    """
    return F.sha2(normalize_ws(col), 256)
