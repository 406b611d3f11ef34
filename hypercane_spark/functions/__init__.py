from hypercane_spark.functions.urls import (  # noqa: F401
    url_host,
    url_path,
    url_query,
    path_depth,
    registered_domain,
    surt_host,
    surt_key,
    raw_urim,
    url_category_score,
    wayback_datetime_guess,
)
from hypercane_spark.functions.hashes import (  # noqa: F401
    tokens_ws,
    simhash64,
    tf_simhash64,
    hamming64,
    hamming_frac,
    minhash_hex,
    lsh_bands_hex,
    det_rank,
)
from hypercane_spark.functions.text import (  # noqa: F401
    token_count,
    bpe_ish_token_count,
    sentence_count,
    stopword_ratio,
    punct_ratio,
    quality_score,
    language_guess,
    doc_fingerprint,
)
