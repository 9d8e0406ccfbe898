"""OData REST-response decoding + metadata projection (SURVEY.md §2.1 S4,
§2.2 P1) and the dormant classifiers (§2.7 F2) — all JVM-side builtins.

Reference semantics:

* S4 — a folder response is either verbose (wrapped in a top-level
  ``d`` property) or minimal; ``Files``/``Folders`` are either a plain
  array or an object with a ``results`` array
  (SharePointClient.cs:229-237 wrapper detect, :243-262 Files shapes,
  :305-321 Folders shapes). Decoded with ``from_json`` against a schema
  covering both shapes + ``coalesce`` — no Python.
* P1 — every JSON property of a file entity is copied into an
  open-world metadata map (string/int64-else-double/bool/null coercion,
  SharePointClient.cs:358-370); ``Name`` and ``ServerRelativeUrl`` are
  projected into typed columns (:373-380). Here: ``from_json`` to
  ``map<string,string>`` (cast-on-read is the map consumer's job) +
  ``get_json_object`` for the typed fields.
* F2 — CategoryKeywordMap regex classifier HR/IT/Policy/Form
  (SharePointClient.cs:54-60, first match in declaration order wins via
  chained ``when``), PageNumber/Signature/ToC detectors (:44-46).
  Dormant in the reference (never called) but part of the declared
  capability surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# schema for a folder REST response covering verbose + minimal shapes;
# entity payloads stay as raw json strings for open-world P1 projection
_ENTITY = "array<string>"
_SHAPE = (
    f"struct<Files:{_ENTITY}, Folders:{_ENTITY}, "
    f"FilesWrapped:struct<results:{_ENTITY}>, "
    f"FoldersWrapped:struct<results:{_ENTITY}>>"
)


def decode_folder_response(df: DataFrame, json_col: str = "response") -> DataFrame:
    """response json -> (files array<string>, folders array<string>),
    handling d-wrapper and results-wrapper variants (S4).

    Keeping entities as json strings mirrors the reference's
    JsonElement pass-through: the projection (P1) happens per entity.
    """
    c = F.col(json_col)
    # unwrap "d" if present (verbose OData)
    body = F.coalesce(F.get_json_object(c, "$.d"), c)

    def collection(name: str) -> Column:
        # array shape: $.Files as a json array of objects
        plain = F.from_json(F.get_json_object(body, f"$.{name}"), _ENTITY)
        wrapped = F.from_json(F.get_json_object(body, f"$.{name}.results"), _ENTITY)
        return F.coalesce(plain, wrapped, F.array().cast(_ENTITY))

    return df.withColumn("files", collection("Files")).withColumn(
        "folders", collection("Folders")
    )


def project_file_entities(decoded: DataFrame) -> DataFrame:
    """Explode file entities and apply the P1 projection: full metadata
    map + typed Name/ServerRelativeUrl, preserving in-response order
    (sibling_idx — the T1 ordering contract)."""
    exploded = decoded.select(
        "*", F.posexplode_outer("files").alias("sibling_idx", "entity_json")
    ).filter(F.col("entity_json").isNotNull())
    return exploded.select(
        *[c for c in decoded.columns if c not in ("files", "folders")],
        "sibling_idx",
        F.from_json("entity_json", "map<string,string>").alias("metadata"),
        F.get_json_object("entity_json", "$.Name").alias("name"),
        F.get_json_object("entity_json", "$.ServerRelativeUrl").alias("server_relative_url"),
    )


def coerce_json_value(col: Column | str) -> Column:
    """P1 typed coercion of one metadata value (SharePointClient.cs:358-370):
    the reference copies every JSON property as string / int64-else-double
    / bool / null. Returns a struct ``(kind, s, i, d, b)`` with exactly one
    typed field populated (the others null).

    Operates on the STRING form the open-world ``map<string,string>``
    carries (cast-on-read, SURVEY §1.2): ``true``/``false`` -> bool, a
    <=18-digit integer -> int64, other numerics (incl. exponent form) ->
    double, null -> kind 'null', anything else stays string. Caveat vs
    the reference: it switches on the raw JSON token kind, so a JSON
    *string* "true" stays a string there; after the map projection that
    distinction is gone — callers needing it must classify entity_json
    before projection.
    """
    v = F.col(col) if isinstance(col, str) else col
    is_bool = v.rlike(r"^(true|false)$")
    is_long = v.rlike(r"^-?\d{1,18}$")
    is_num = v.rlike(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")
    kind = (
        F.when(v.isNull(), F.lit("null"))
        .when(is_bool, F.lit("bool"))
        .when(is_long, F.lit("long"))
        .when(is_num, F.lit("double"))
        .otherwise(F.lit("string"))
    )
    return F.struct(
        kind.alias("kind"),
        F.when(kind == "string", v).alias("s"),
        F.when(kind == "long", v.cast("long")).alias("i"),
        F.when(kind == "double", v.cast("double")).alias("d"),
        F.when(kind == "bool", v == "true").alias("b"),
    )


def coerce_metadata_map(map_col: Column | str) -> Column:
    """Typed view of the open-world metadata map: every value coerced via
    :func:`coerce_json_value` (map<string, struct<kind,s,i,d,b>>). All
    JVM builtins — ``transform_values`` keeps the coercion inside
    whole-stage codegen."""
    m = F.col(map_col) if isinstance(map_col, str) else map_col
    return F.transform_values(m, lambda _k, v: coerce_json_value(v))


def quote_escape_url(col: Column | str) -> Column:
    """The ``'`` -> ``''`` endpoint escaping (S3, SharePointClient.cs:387)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "'", "''")


def file_value_endpoint(site_url: Column | str, server_relative_url: Column | str) -> Column:
    """Build the $value download endpoint (SharePointClient.cs:388)."""
    s = F.col(site_url) if isinstance(site_url, str) else site_url
    u = quote_escape_url(server_relative_url)
    return F.concat(s, F.lit("/_api/web/GetFileByServerRelativeUrl('"), u, F.lit("')/$value"))


# ------------------------------------------------------------- F2 family

# (regex, category) in declaration order — first match wins
CATEGORY_KEYWORD_MAP = [
    (r"(?i)\b(hr|human resources|employee)\b", "HR"),
    (r"(?i)\b(it|information technology|software|system)\b", "IT"),
    (r"(?i)\b(policy|procedure|guideline)\b", "Policy"),
    (r"(?i)\b(form|template)\b", "Form"),
]

PAGE_NUMBER_REGEX = r"(?i)^(page\s*\d+(\s*of\s*\d+)?)|^\d+$"
SIGNATURE_REGEX = r"(?i)^(signature|signed|approved by|prepared by).*"
TOC_REGEX = r"(?i)table of contents"


def classify_category(col: Column | str, default: str = "Other") -> Column:
    """Chained-when regex classifier (SharePointClient.cs:54-60)."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for pattern, label in CATEGORY_KEYWORD_MAP:
        cond = c.rlike(pattern)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return expr.otherwise(F.lit(default))


def is_page_number_line(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(PAGE_NUMBER_REGEX)


def is_signature_line(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(SIGNATURE_REGEX)


def is_toc_line(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(TOC_REGEX)


STOPWORDS_REFERENCE = [
    "the", "and", "for", "with", "that", "this", "from", "have", "will",
    "their", "are", "was", "were", "has", "had", "but", "not", "you",
    "your", "about", "into", "can", "shall", "may", "might", "should",
    "could", "been", "being", "over", "under", "after", "before",
    "between", "within", "upon", "without", "including", "include",
    "such", "each", "any", "other", "more", "most", "some", "than",
    "too", "very", "one", "two", "three",
]


def remove_stopwords(col: Column | str) -> Column:
    """StopWords removal (SharePointClient.cs:61-64, dormant):
    array_except over lowercased word split."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.lower(F.trim(c)), r"\W+")
    return F.array_except(words, F.array(*[F.lit(w) for w in STOPWORDS_REFERENCE]))
