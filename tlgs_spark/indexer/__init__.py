from .build import assign_doc_ids, build_index, tokenize_tokens  # noqa: F401
from .codec import (  # noqa: F401
    decode_postings,
    decode_varints,
    encode_postings,
    encode_varints,
)
from .storage import IndexStorage  # noqa: F401
