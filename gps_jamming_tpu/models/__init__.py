from . import detector, rssi, tdoa
