from .link_rank import hits_rank, salsa_rank  # noqa: F401
