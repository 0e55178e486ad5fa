"""vyntr_ray — a Ray-Data-native rebuild of outpoot/vyntr's data engine.

Brand-new implementation (no code copied from the reference); the reference
at /root/reference defines WHAT is computed, this package defines HOW —
Ray ``Dataset`` pipelines over zero-copy Arrow batches, actor pools for
stateful stages, explicit partitioning for the 10^10-URL scale target.
"""

from .extract import ParsedHtml, parse_html, sanitize_text
from .urls import (
    extract_domain,
    extract_domain_simple,
    is_ignored_file_type,
    join_url,
    md5_partition,
    normalize_url,
)

__all__ = [
    "ParsedHtml",
    "parse_html",
    "sanitize_text",
    "normalize_url",
    "join_url",
    "extract_domain",
    "extract_domain_simple",
    "is_ignored_file_type",
    "md5_partition",
]
__version__ = "0.1.0"
