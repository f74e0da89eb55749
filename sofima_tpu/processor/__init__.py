from sofima_tpu.processor.base import (OutputNums, SubvolumeProcessor,
                                       SuggestedXyz)
from sofima_tpu.processor.runner import process_volume
