from .pages import (PAGES_SCHEMA, gen_page, generate_pages, pages_batch,
                    read_pages, write_pages_corpus)

__all__ = ["PAGES_SCHEMA", "gen_page", "pages_batch", "generate_pages",
           "read_pages", "write_pages_corpus"]
