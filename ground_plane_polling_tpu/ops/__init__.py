from . import anchors
from . import box_coder
from . import filtering
from . import overlap
from . import polling
from . import pose
from . import targets
