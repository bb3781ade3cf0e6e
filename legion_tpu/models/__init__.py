from legion_tpu.models.graphsage import GraphSAGE
from legion_tpu.models.gcn import GCN
from legion_tpu.models.gat import GAT
from legion_tpu.models.lp_sage import LinkPredSAGE
from legion_tpu.models.common import make_model

__all__ = ["GraphSAGE", "GCN", "GAT", "LinkPredSAGE", "make_model"]
