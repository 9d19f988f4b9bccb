"""SQL surface for the text/URL pipeline tier — Spark 4 SQL scalar
functions (``CREATE TEMPORARY FUNCTION … RETURN <expr>``) whose bodies are
generated from the SAME pattern constants as the Column API
(operators/textops.py, operators/urlops.py), so ``spark.sql`` users get
bit-identical semantics with zero Python in the plan (the body inlines
into Catalyst like any SQL expression — predicate pushdown and codegen
apply as usual, unlike a registered UDF).
"""
from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators import urlops as U
from ..operators.textops import (HTML_ENTITY_STEPS, HTML_TO_TEXT_STEPS,
                                 _CTRL_PATTERN, _SENT_PATTERN, _ZW_PATTERN)

__all__ = ["register_text_sql_functions"]


def _q(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "''")


def _html_to_text_body(e: str) -> str:
    out = e
    for pat, repl in HTML_TO_TEXT_STEPS:
        out = f"regexp_replace({out}, '{_q(pat)}', '{repl}')"
    for ent, ch in HTML_ENTITY_STEPS:
        out = f"replace({out}, '{_q(ent)}', '{_q(ch)}')"
    return f"trim(regexp_replace({out}, '{_q(chr(92) + 's+')}', ' '))"


def _escape_html_body(e: str) -> str:
    return (f"replace(replace(replace({e}, '&', '&amp;'), "
            f"'<', '&lt;'), '>', '&gt;')")


def _clean_body(e: str) -> str:
    out = f"regexp_replace({e}, '{_q(_CTRL_PATTERN)}', '')"
    return f"regexp_replace({out}, '{_q(_ZW_PATTERN)}', '')"


def _sentences_body(e: str) -> str:
    return (f"filter(transform(regexp_extract_all({e}, "
            f"'{_q(_SENT_PATTERN)}', 0), x -> trim(x)), x -> x <> '')")


def _url_bodies():
    ex = lambda pat: f"regexp_extract(u, '{_q(pat)}', 1)"  # noqa: E731
    scheme = f"lower({ex(U._P_SCHEME)})"
    host = f"lower({ex(U._P_HOST)})"
    port = ex(U._P_PORT)
    path = ex(U._P_PATH)
    query = ex(U._P_QUERY)
    clean_q = (f"array_join(filter(split({query}, '&'), "
               f"p -> p <> '' AND NOT p rlike '{_q(U._P_TRACK)}'), '&')")
    keep = (f"({port} <> '' AND NOT ({scheme} = 'http' AND {port} = '80') "
            f"AND NOT ({scheme} = 'https' AND {port} = '443'))")
    normalize = (
        f"concat({scheme}, '://', {host}, "
        f"CASE WHEN {keep} THEN concat(':', {port}) ELSE '' END, "
        f"CASE WHEN {path} = '' THEN '/' ELSE {path} END, "
        f"CASE WHEN {clean_q} <> '' THEN concat('?', {clean_q}) "
        f"ELSE '' END)"
    )
    slds = ", ".join(f"'{s}'" for s in U._SLD)
    parts = "split(h, '\\\\.')"
    domain = (
        f"CASE WHEN size({parts}) <= 2 THEN h "
        f"WHEN size({parts}) >= 3 AND element_at({parts}, -2) IN ({slds}) "
        f"AND length(element_at({parts}, -1)) = 2 "
        f"THEN concat_ws('.', element_at({parts}, -3), "
        f"element_at({parts}, -2), element_at({parts}, -1)) "
        f"ELSE concat_ws('.', element_at({parts}, -2), "
        f"element_at({parts}, -1)) END"
    )
    return scheme, host, path, query, normalize, domain


def register_text_sql_functions(spark: SparkSession) -> None:
    """Register the pipeline tier for ``spark.sql``. Idempotent
    (OR REPLACE). NFC normalization is excluded (needs the Python stage —
    use the Column API's ``clean_text(nfc=True)``)."""
    defs = []
    defs.append(("html_to_text", "h STRING", "STRING",
                 _html_to_text_body("h")))
    defs.append(("escape_html", "s STRING", "STRING",
                 _escape_html_body("s")))
    defs.append(("clean_text_ascii", "s STRING", "STRING",
                 _clean_body("s")))
    defs.append(("split_sentences", "s STRING", "ARRAY<STRING>",
                 _sentences_body("s")))
    scheme, host, path, query, normalize, domain = _url_bodies()
    defs.append(("url_scheme", "u STRING", "STRING", scheme))
    defs.append(("url_host", "u STRING", "STRING", host))
    defs.append(("url_path", "u STRING", "STRING", path))
    defs.append(("url_query", "u STRING", "STRING", query))
    defs.append(("url_normalize", "u STRING", "STRING", normalize))
    defs.append(("registrable_domain", "h STRING", "STRING", domain))
    for name, arg, ret, body in defs:
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({arg}) "
            f"RETURNS {ret} RETURN {body}"
        )
