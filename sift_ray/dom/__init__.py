from .parser import Node, parse_html
from .selector import SelectorError, select
from .serialize import inner_html, outer_html

__all__ = ["Node", "parse_html", "select", "SelectorError", "inner_html",
           "outer_html"]
