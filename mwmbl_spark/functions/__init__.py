from mwmbl_spark.functions.tokenize import (  # noqa: F401
    tokenize_expr,
    bigrams_expr,
    index_terms_expr,
    prepare_url_expr,
    tokenize_pd,
    tokenize_py,
    get_bigrams_py,
    index_terms_py,
)
