"""The ordered matcher catalogs.

COMMON_MATCHERS mirrors the reference's catalog rule-for-rule, in declaration
order (order is load-bearing: first-match-wins, broad patterns at the tail —
/root/reference/src/common.rs:491-2639, /root/reference/src/match.rs:247-254).
"""

from .helpers import *  # noqa: F401,F403
from .common1 import PART1
from .common2 import PART2
from .common3 import PART3
from .common4 import PART4
from .secondary import SECONDARY_MATCHERS  # noqa: F401
from ..core.matchers import MatcherGroup

_ALL = [*PART1, *PART2, *PART3, *PART4]

COMMON_MATCHERS = MatcherGroup(_ALL)
