from . import anchors
from . import box_coder
from . import overlap
