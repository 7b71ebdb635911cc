"""Scalar Column-expression builders — reference §2.8 F1–F21.

All pure ``pyspark.sql.functions`` expressions (JVM-side, inside
whole-stage codegen); no row-at-a-time Python in the hot path.
"""

from nashville_etl_service_backup_spark.functions.categorize import (  # noqa: F401
    categorize_event,
    categorize_with_trust_gate,
    detect_genre,
)
from nashville_etl_service_backup_spark.functions.cleaning import (  # noqa: F401
    safe_double,
    standardize_price,
    standardize_venue_name,
    title_case_category,
)
from nashville_etl_service_backup_spark.functions.dates import (  # noqa: F401
    display_date,
    standardize_date,
)
from nashville_etl_service_backup_spark.functions.geo import (  # noqa: F401
    ring_centroid,
    validate_coords,
)
from nashville_etl_service_backup_spark.functions.text import (  # noqa: F401
    md5_url,
    search_tokens,
    slug_url,
    text_match,
    text_rank,
    truncate_with_ellipsis,
)
