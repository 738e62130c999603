"""Connector layer (SURVEY.md §2.1 S1-S5, S7).

The reference's sources are three JSON-RPC entity scans over the Geotab
API with server-side filter pushdown, plus a REST sink to CloudTAK.
Here that becomes a PySpark Python DataSource (``spark.dataSource.
register``) whose reader translates Catalyst filters into the RPC
``search`` payload and partitions the scan per fleet group, and whose
writer POSTs GeoJSON feature batches per partition.
"""

from etl_geotab_spark.sources.geotab import (
    GeotabCredentialCache,
    GeotabDataSource,
    register_geotab_source,
)

__all__ = [
    "GeotabCredentialCache",
    "GeotabDataSource",
    "register_geotab_source",
]
