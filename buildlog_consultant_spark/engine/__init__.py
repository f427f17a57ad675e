from .core import (  # noqa: F401
    find_build_failure_description,
    find_secondary_build_failure,
    match_lines,
)
