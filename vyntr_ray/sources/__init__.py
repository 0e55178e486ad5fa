from .pages import (
    PAGES_SCHEMA,
    gen_pages_table,
    gen_robots_table,
    make_pages_dataset,
    make_seed_list,
    page_host,
    page_url,
    write_pages_store,
)

__all__ = [
    "PAGES_SCHEMA",
    "gen_pages_table",
    "gen_robots_table",
    "make_pages_dataset",
    "make_seed_list",
    "page_host",
    "page_url",
    "write_pages_store",
]
