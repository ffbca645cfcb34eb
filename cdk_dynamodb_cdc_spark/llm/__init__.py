"""LLM-training-data pipeline operators (SURVEY.md §2C).

Extension scope beyond the reference (north star in BASELINE.json):
deduplication (exact / MinHash-LSH / SimHash), similarity search over
embeddings, text analysis, and multimodal binary-column plumbing — all
over the `documents` and `embeddings` corpus tables.
"""

from cdk_dynamodb_cdc_spark.llm.text import (  # noqa: F401
    doc_fingerprint,
    lang_id,
    simhash60,
    text_quality,
    token_hash60,
    tokens,
)
from cdk_dynamodb_cdc_spark.llm.dedup import (  # noqa: F401
    connected_components,
    connected_components_star,
    exact_dedup_groups,
    incremental_near_dup_pairs,
    minhash_index,
    minhash_near_dup_pairs,
    simhash_near_dup_pairs,
    substring_dup_stats,
)
from cdk_dynamodb_cdc_spark.llm.curation import (  # noqa: F401
    decontaminate,
    pack_sequences,
    stratified_sample,
    temperature_mix,
    weighted_sample,
)
from cdk_dynamodb_cdc_spark.llm.vectors import (  # noqa: F401
    ann_cosine_topk,
    cosine_topk,
    ivf_cosine_topk,
    lsh_near_dup_pairs,
    pq_topk,
)
from cdk_dynamodb_cdc_spark.llm.quality_lm import (  # noqa: F401
    doc_logprob_scores,
    perplexity_filter,
)
from cdk_dynamodb_cdc_spark.llm.classify import (  # noqa: F401
    predict_nb,
    train_nb,
)
from cdk_dynamodb_cdc_spark.llm.multimodal import (  # noqa: F401
    attach_binary_payload,
    decode_metadata,
    sample_frames,
)
