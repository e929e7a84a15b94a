from .gather_interp import (EtaSection, Section, eval_sections,
                            use_pallas_default)

__all__ = ["EtaSection", "Section", "eval_sections", "use_pallas_default"]
