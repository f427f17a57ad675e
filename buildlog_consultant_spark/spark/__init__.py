from .session import get_spark  # noqa: F401
from .classify import classify_documents, CLASSIFY_RESULT_FIELDS  # noqa: F401
from .enrich import kind_remediation_df, enrich_with_remediation  # noqa: F401
