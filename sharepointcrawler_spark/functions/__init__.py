from sharepointcrawler_spark.functions.urlnorm import (  # noqa: F401
    canonicalize_url,
    url_host,
    url_key,
    url_extension,
    with_url_columns,
)
