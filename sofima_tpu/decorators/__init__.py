from sofima_tpu.decorators.base import Decorator, Filter, build, register, registered
from sofima_tpu.decorators import affine, flow, maps, warp  # registers all
