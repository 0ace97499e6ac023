"""Per-server connection feature sets — one shuffle, all servers.

Replaces the reference's per-server driver loop (reference:
Src/servers.py:56-70 — two filter+collect jobs per server, O(#servers)
Spark jobs, the worst scalability defect in the pipeline; SURVEY.md
§4.3). Here every server's In/Out connection set is computed in a
single union + groupBy pass, so the cost is one shuffle over the
Request rows regardless of how many distinct servers exist.

Connection encoding matches the reference exactly
(Src/servers.py:37-70): a Request X->Y with requester depth d yields
- for Y: "X_In_d"   (incoming: X called Y; d = depth of X)
- for X: "Y_Out_d"  (outgoing: X called Y; d = depth of X)
and 'user' gets a row like any other server (without_user=False at
Src/servers.py:56).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def server_connections(logs_with_depth_df: DataFrame) -> DataFrame:
    """(server_name, connections array<string>) for every server.

    Input must carry ``depth_from`` (see functions.tree.logs_with_depth).
    """
    requests = logs_with_depth_df.filter(F.col("action") == "Request")
    incoming = requests.select(
        F.col("state_to").alias("server_name"),
        F.concat_ws("_", "state_from", F.lit("In"), "depth_from").alias("connection"),
    )
    outgoing = requests.select(
        F.col("state_from").alias("server_name"),
        F.concat_ws("_", "state_to", F.lit("Out"), "depth_from").alias("connection"),
    )
    return (
        incoming.unionByName(outgoing)
        .groupBy("server_name")
        .agg(F.array_sort(F.collect_set("connection")).alias("connections"))
    )
