from . import gps, jammers, mix, scenario, trajectory
