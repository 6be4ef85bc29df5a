from search_engine_ray.analyzer.tokenizers import (  # noqa: F401
    StandardTokenizer,
    WhitespaceTokenizer,
    Tokenizer,
    get_tokenizer,
    register_tokenizer,
)
