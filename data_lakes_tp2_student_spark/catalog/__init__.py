"""Query catalog: importing this package registers every implemented query
(with its DuckDB oracle SQL) into ``registry.REGISTRY``.

One module per SURVEY.md §2 operator group.
"""

from ..registry import REGISTRY, Query  # noqa: F401

from . import analytics  # noqa: F401,E402
from . import events_windows  # noqa: F401,E402
from . import extras  # noqa: F401,E402
from . import extras2  # noqa: F401,E402
from . import ingest  # noqa: F401,E402
from . import llm_ops  # noqa: F401,E402
from . import llm_ops2  # noqa: F401,E402
from . import llm_ops3  # noqa: F401,E402
from . import llm_ops4  # noqa: F401,E402
from . import llm_ops5  # noqa: F401,E402
from . import llm_ops6  # noqa: F401,E402
from . import pipeline_ops  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import relational2  # noqa: F401,E402
from . import relational3  # noqa: F401,E402
from . import relational4  # noqa: F401,E402
from . import relational5  # noqa: F401,E402
from . import stats  # noqa: F401,E402
