from .flow_match import SDXLFlowMatch, SDXLFlowMatchConfig

__all__ = ["SDXLFlowMatch", "SDXLFlowMatchConfig"]
