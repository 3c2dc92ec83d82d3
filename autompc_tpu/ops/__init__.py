from . import lstsq, riccati
