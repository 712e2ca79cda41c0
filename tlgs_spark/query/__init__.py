from .engine import EmptyQueryError, SearchIndex  # noqa: F401
from .parser import SearchFilter, parse_search_query  # noqa: F401
from .snippet import make_snippet  # noqa: F401
