"""HTML -> text extraction for web-corpus curation — JVM built-ins only.

The first transform of any crawl pipeline (CCNet/RefinedWeb/Dolma run a
full parser; the portable core is the same rule chain): drop the
non-content blocks, strip markup, decode entities, normalize whitespace.
Everything here is pure ``pyspark.sql.functions`` regexp/replace
expressions — map-only, whole-stage codegen, pushes past the scan — with
an exact DuckDB twin (``extract_html_text_sql``), so it is
oracle-checkable by the driver harness like ``ops/web.py``.

The regex subset is the Java-regex / RE2 common core: inline ``(?is)``
flags, lazy ``.*?``, single-component negated classes (``[^>]`` — see
the JVM pathology note on 3+-component negated classes), NO
backreferences (RE2 has none, so script/style blocks get their own
literal close-tag patterns instead of ``</\\1>``).

Extraction rule (documented, deterministic — the point is a STABLE,
oracle-checkable transform, not WHATWG completeness):

1. drop ``<script ...>...</script>``, ``<style ...>...</style>`` and
   ``<!-- ... -->`` blocks entirely (case-insensitive, dot-matches-all);
2. block-level boundaries (``<br>``, ``<p>``/``</p>``, ``div``, ``li``,
   ``ul``/``ol``, ``tr``/``table``, ``h1``..``h6``, ``title``) become
   newlines — paragraph structure survives for the line-level passes
   (``dedup_lines``, ``boilerplate_lines``);
3. every remaining tag becomes a space;
4. entities decode AFTER markup is gone (fixed portable list: ``&nbsp;
   &lt; &gt; &quot; &#39;`` then ``&amp;`` LAST, the standard unescape
   order so ``&amp;lt;`` decodes to the literal text ``&lt;``);
5. whitespace normalizes: any run containing a newline collapses to one
   ``\\n``, remaining space/tab runs to one space, then trim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (pattern, replacement) regexp chain, applied in order.  Kept as data so
# the Spark expression and the DuckDB SQL twin are generated from the SAME
# list — they cannot drift apart.
_TAG_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?is)</?(br|p|div|li|ul|ol|tr|table|h[1-6]|title)\b[^>]*>", "\n"),
    (r"(?s)<[^>]+>", " "),
]
# plain (non-regex) entity decodes, order significant: &amp; LAST
_ENTITY_STEPS: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", "\""),
    ("&#39;", "'"),
    ("&amp;", "&"),
]
_WS_STEPS: list[tuple[str, str]] = [
    (r"[ \t\r]*\n[ \t\r\n]*", "\n"),
    (r"[ \t\r]+", " "),
    (r"^\s+|\s+$", ""),
]


def html_to_text(col) -> Column:
    """Composable extraction expression (rule chain in the module
    docstring). Pure per-row JVM regexp/replace built-ins — map-only."""
    s = col if isinstance(col, Column) else F.col(col)
    for pat, rep in _TAG_STEPS:
        s = F.regexp_replace(s, pat, rep)
    for lit, rep in _ENTITY_STEPS:
        s = F.replace(s, F.lit(lit), F.lit(rep))
    for pat, rep in _WS_STEPS:
        s = F.regexp_replace(s, pat, rep)
    return s


def extract_html_text(docs: DataFrame, html_col: str = "html",
                      out_col: str = "text") -> DataFrame:
    """Project extracted text alongside the existing columns (map-only;
    at 100 TB this is the embarrassingly-parallel stage — no shuffle, no
    Python, scales with input bytes)."""
    return docs.withColumn(out_col, html_to_text(F.col(html_col)))


def extract_html_text_sql(expr: str) -> str:
    """DuckDB twin of ``html_to_text`` over SQL expression ``expr`` —
    generated from the same step tables (RE2 accepts the inline flags;
    the 'g' option makes each step global like Spark's regexp_replace)."""
    def _rep_sql(rep: str) -> str:
        # RE2 rewrite treats a literal backslash-n as empty, not newline —
        # newline replacements must go through chr(10) (probed in tests)
        return "chr(10)" if rep == "\n" else "'" + rep.replace("'", "''") + "'"

    s = expr
    for pat, rep in _TAG_STEPS:
        s = ("regexp_replace(" + s + ", '" + pat.replace("'", "''")
             + "', " + _rep_sql(rep) + ", 'g')")
    for lit, rep in _ENTITY_STEPS:
        s = ("replace(" + s + ", '" + lit + "', '"
             + rep.replace("'", "''") + "')")
    for pat, rep in _WS_STEPS:
        s = ("regexp_replace(" + s + ", '" + pat.replace("'", "''")
             + "', " + _rep_sql(rep) + ", 'g')")
    return s
