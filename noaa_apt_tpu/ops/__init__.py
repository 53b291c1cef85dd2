from .resample import (
    fast_resample,
    resample_plan,
    causal_filter,
    decimate,
    expanded_filtered,
)
from .demod import demodulate
from .sync import generate_sync_frame, sync_correlate, find_sync_peaks
