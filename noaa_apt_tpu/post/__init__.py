from .contrast import percent, map_signal_u8
from .telemetry import Telemetry, read_telemetry
