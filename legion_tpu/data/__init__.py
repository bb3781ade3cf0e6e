from legion_tpu.data.format import LegionDataset, write_legion_dataset
from legion_tpu.data.synthetic import synthesize_dataset

__all__ = ["LegionDataset", "write_legion_dataset", "synthesize_dataset"]
