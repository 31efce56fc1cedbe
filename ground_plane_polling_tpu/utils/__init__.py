from . import colors
from . import eval as evaluation
from . import kitti_writer
