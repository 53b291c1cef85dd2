from .geometry import azimuth, distance, reckon
