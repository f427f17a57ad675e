from .problems import Problem  # noqa: F401
from .matchers import (  # noqa: F401
    SingleLineMatch,
    MultiLineMatch,
    Rule,
    MatcherGroup,
)
