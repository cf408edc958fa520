from .catalog import DatasetCatalog
from .defaults import get_default_cfg
from .node import ConfigNode

__all__ = ["ConfigNode", "DatasetCatalog", "get_default_cfg"]
