from .logging import RingLogger, create_logger
from .format import format_poly_count
