from .api import ExtractError, SelectorNotFoundError, to_markdown

__all__ = ["to_markdown", "ExtractError", "SelectorNotFoundError"]
