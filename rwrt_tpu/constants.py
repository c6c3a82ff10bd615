"""Physical and numerical constants.

TPU-native counterpart of the reference constants module
(/root/reference/constants.py:13-29). Values are plain Python floats so they
fold into XLA programs at trace time at whatever precision the surrounding
computation uses.
"""

import numpy as np

pi: float = 3.14159265358979323846264338327950288419716939937510
deg2rad: float = pi / 180.0
rad2deg: float = 180.0 / pi

#: Earth radius in meters (reference constants.py:16).
rearth: float = 6.3712e6
#: Earth rotation rate in 1/s (reference constants.py:17).
omega: float = 7.2921e-5

one: float = 1.0
zero: float = 0.0

hour: float = 3600.0
day: float = 24.0 * hour

#: Threshold for approximate float equality (reference constants.py:28); used
#: e.g. to decide whether a polynomial root is real (|Im| < delt).
delt: float = 1.0e-8

#: Missing-value marker. The whole framework uses NaN-as-dead-ray semantics
#: (reference constants.py:29).
undef: float = float(np.nan)

#: Polar cap guard: background sampling returns zeros where |cos(lat)| <= this
#: (reference bs.py:730, bs.py:858-860).
polar_cos_cap: float = 0.0175

#: Runaway meridional wavenumber cutoff |m*R| >= 100 terminates a ray
#: (reference wr.py:509, bs.py:979).
mwn_cap: float = 100.0
