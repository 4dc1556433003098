from arlas_proc_spark.functions.content import (  # noqa: F401
    normalize_lang,
    sha256_content,
    with_content_hash,
    with_normalized_lang,
)
