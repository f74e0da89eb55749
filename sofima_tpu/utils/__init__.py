from sofima_tpu.utils.bounding_box import BoundingBox
from sofima_tpu.utils.box_generator import BoxGenerator
from sofima_tpu.utils.subvolume import Subvolume
