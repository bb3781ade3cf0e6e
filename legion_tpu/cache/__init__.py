from legion_tpu.cache.hotness import presample_hotness
from legion_tpu.cache.cost_model import CostModelResult, plan_cache
from legion_tpu.cache.unified_cache import UnifiedCache

__all__ = ["presample_hotness", "CostModelResult", "plan_cache",
           "UnifiedCache"]
