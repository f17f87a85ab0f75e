"""Re-export of the reference HTML fixtures (single source of truth
in sift_ray.sources.fixture_pages)."""

from sift_ray.sources.fixture_pages import (BLOG_POST_HTML,
                                            MALFORMED_HTML, SIMPLE_HTML)

__all__ = ["SIMPLE_HTML", "BLOG_POST_HTML", "MALFORMED_HTML"]
