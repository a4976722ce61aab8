from timefence_spark.operators import (
    bpe,
    dedup,
    fusion,
    hf_tokenizer,
    multimodal,
    packing,
    pii,
    sampling,
    similarity,
    text,
    unigram,
    web,
    wordpiece,
)
from timefence_spark.operators.asof import asof_join, pit_match

__all__ = [
    "asof_join",
    "pit_match",
    "bpe",
    "dedup",
    "fusion",
    "hf_tokenizer",
    "packing",
    "pii",
    "sampling",
    "similarity",
    "text",
    "multimodal",
    "unigram",
    "web",
    "wordpiece",
]
