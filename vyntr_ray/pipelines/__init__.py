from .crawl import ANALYSES_SCHEMA, CrawlStats, run_crawl

__all__ = ["run_crawl", "CrawlStats", "ANALYSES_SCHEMA"]
