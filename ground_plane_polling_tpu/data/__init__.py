from . import kitti
from . import label_prep
from . import planes
