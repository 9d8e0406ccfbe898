"""Registrable-domain extraction (public-suffix algorithm) for
site-level politeness grouping.

A web-scale crawler must rate-limit by *site* (registrable domain),
not raw host: ``news.bbc.co.uk`` and ``www.bbc.co.uk`` are one site,
while ``a.blogspot.com`` and ``b.blogspot.com`` are different sites.
The publicsuffix.org algorithm: among all rules matching a host pick
the prevailing one (exception rules ``!www.ck`` beat everything, else
the longest match, else the implicit ``*`` rule = bare TLD); the
public suffix is the prevailing rule's labels (exception rules minus
their first label); the registrable domain is the suffix plus one more
label, or NULL when the host IS a public suffix.

Implementation is a pure Column expression — the rule sets are
literals folded into the plan, candidate suffixes come from an
unrolled ``element_at``/``array_join`` chain over the split host, so
the whole computation stays inside whole-stage codegen with zero
shuffles, zero joins and zero Python. Rules are capped at
``_MAX_RULE_LABELS`` labels (the real list's deepest rules are 5).

``PSL_SNAPSHOT`` is a deterministic curated subset of the public list
(enough to exercise every rule type); production use passes the full
publicsuffix.org dat file contents via ``rules=``. The reference
crawls a single intranet tenant and never needs this
(SharePointClient.cs keys everything on one site URL); at 100 TB of
general web text it is what keeps per-site politeness and per-site
stats honest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Curated deterministic snapshot of publicsuffix.org rules: normal
# rules, wildcard rules, exception rules, and private-registry suffixes
# (blogspot/github.io) — one of each structural kind the algorithm
# distinguishes. NOT the full list; pass `rules=` for that.
PSL_SNAPSHOT: list[str] = [
    "com", "org", "net", "edu", "gov", "io", "co",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk",
    "jp", "co.jp", "ne.jp",
    "au", "com.au", "org.au",
    "de", "fr", "nl", "it", "us",
    "*.ck", "!www.ck",
    "*.bd",
    "github.io", "blogspot.com",
]

_MAX_RULE_LABELS = 5


def _parse_rules(rules: list[str]) -> tuple[set[str], set[str], set[str]]:
    """Split a publicsuffix.org rule list into (exact, wildcard-bases,
    exception-hosts). Wildcard ``*.ck`` is stored as its base ``ck``;
    exception ``!www.ck`` as ``www.ck``. Comment/blank lines skipped."""
    exact: set[str] = set()
    wild: set[str] = set()
    exc: set[str] = set()
    for raw in rules:
        r = raw.strip().lower()
        if not r or r.startswith("//"):
            continue
        if r.startswith("!"):
            exc.add(r[1:])
        elif r.startswith("*."):
            wild.add(r[2:])
        else:
            exact.add(r)
    return exact, wild, exc


def _suffix_of(labels: Column, n: Column, k: int) -> Column:
    """Dot-joined suffix of the last ``k`` labels (NULL if host has
    fewer than ``k`` labels)."""
    return F.when(n >= k, F.array_join(F.slice(labels, -k, k), "."))


def registrable_domain(
    host: Column | str, rules: list[str] | None = None
) -> Column:
    """The registrable domain ("site") of a hostname per the
    publicsuffix.org algorithm, as a single codegen-friendly
    expression. NULL for NULL/empty hosts and for hosts that ARE a
    public suffix (nothing is registrable at ``co.uk``)."""
    h = F.col(host) if isinstance(host, str) else host
    exact, wild, exc = _parse_rules(rules or PSL_SNAPSHOT)

    low = F.lower(F.trim(h))
    labels = F.split(low, r"\.")
    n = F.size(labels)

    # public-suffix label count by descending precedence:
    #   exception match at k labels  -> suffix is k-1 labels
    #   exact rule match at k labels -> suffix is k labels
    #   wildcard base match at k-1   -> suffix is k labels
    #   fallback (implicit "*")      -> 1 label
    ps_labels = F.lit(1)
    for k in range(2, _MAX_RULE_LABELS + 1):  # ascending: longer wins
        cand = _suffix_of(labels, n, k)
        base = _suffix_of(labels, n, k - 1)  # wildcard base under cand
        if wild:
            ps_labels = F.when(
                (n > k - 1) & base.isin(*sorted(wild)) & (n >= k), F.lit(k)
            ).otherwise(ps_labels)
        if exact:
            ps_labels = F.when(cand.isin(*sorted(exact)), F.lit(k)).otherwise(
                ps_labels
            )
    if exc:
        for k in range(1, _MAX_RULE_LABELS + 1):
            cand = _suffix_of(labels, n, k)
            ps_labels = F.when(cand.isin(*sorted(exc)), F.lit(k - 1)).otherwise(
                ps_labels
            )

    reg = F.array_join(
        F.slice(labels, -(F.lit(0) + ps_labels + 1), ps_labels + 1), "."
    )
    return F.when(
        low.isNull() | (low == "") | (n <= ps_labels), F.lit(None).cast("string")
    ).otherwise(reg)


def with_site_column(
    df: DataFrame,
    host_col: str = "host",
    out_col: str = "site",
    rules: list[str] | None = None,
) -> DataFrame:
    """Attach the registrable-domain ``site`` column — the grouping key
    for site-level politeness (``assign_fetch_slots(group_col="site")``)
    and per-site corpus stats. Hosts with no registrable domain (bare
    TLDs, IPs-as-hosts, empty) fall back to the raw host so politeness
    still throttles them as one bucket."""
    reg = registrable_domain(F.col(host_col), rules=rules)
    return df.withColumn(out_col, F.coalesce(reg, F.col(host_col)))
