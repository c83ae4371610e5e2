"""Server transports: Arrow Flight serving + remote-engine federation."""

from beacon_spark.server.flight import BeaconFlightServer
from beacon_spark.server.remote import RemoteBeacon

__all__ = ["BeaconFlightServer", "RemoteBeacon"]
