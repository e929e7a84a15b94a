from .gather_interp import Section, eval_sections, use_pallas_default

__all__ = ["Section", "eval_sections", "use_pallas_default"]
