from .catalog import DatasetCatalog
from .defaults import get_default_cfg
from .flagship import flagship_batch, flagship_cfg
from .node import ConfigNode

__all__ = ["ConfigNode", "DatasetCatalog", "flagship_batch",
           "flagship_cfg", "get_default_cfg"]
