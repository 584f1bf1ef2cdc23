# Wire-compat smoke: run the reference's EXACT pyarrow client calls
# (/root/reference/client/main.py:9-13) against the graft Flight server.
# This is the strongest interop proof available in-container: a stock,
# unmodified pyarrow.flight client over real gRPC/TCP.
#
# Usage:
#   1. SPARK_GRAFT_FLIGHT_PORT=32010 sbt "runMain graft.Serve" &
#   2. python3 tools/flight_smoke.py [port]
import sys

from pyarrow import flight

port = sys.argv[1] if len(sys.argv) > 1 else "32010"
client = flight.FlightClient(location=f"grpc://localhost:{port}",
                             disable_server_verification=True)

# client/main.py:11 — ticket IS the SQL text
table = client.do_get(flight.Ticket("SELECT 1 AS a".encode("utf-8"))).read_all()
print(table)
assert table.column("a").to_pylist() == [1], table

# the go smoke client's catalog query (client/main.go:27)
table = client.do_get(flight.Ticket(
    b"SELECT extension_name FROM duckdb_extensions() WHERE installed")).read_all()
print(table)
assert "parquet" in table.column("extension_name").to_pylist(), table

# a typed fixture query: dates, decimals, strings
table = client.do_get(flight.Ticket(
    b"SELECT o_orderkey, o_orderdate, o_totalprice, o_orderpriority "
    b"FROM orders ORDER BY o_orderkey LIMIT 5")).read_all()
print(table)
assert table.num_rows == 5

# GetFlightInfo: schema without execution, then DoGet the endpoint ticket
# (the ADBC two-step, minus the driver package)
desc = flight.FlightDescriptor.for_command(
    b"SELECT r_name FROM region ORDER BY r_regionkey")
info = client.get_flight_info(desc)
print("GetFlightInfo schema:", info.schema)
table = client.do_get(info.endpoints[0].ticket).read_all()
assert table.column("r_name").to_pylist()[0] == "AFRICA", table

# read-only enforcement over the wire
try:
    client.do_get(flight.Ticket(b"CREATE TABLE hack AS SELECT 1")).read_all()
    raise SystemExit("FAIL: write statement was accepted")
except flight.FlightError as e:
    assert "read-only" in str(e), e
    print("write rejected:", type(e).__name__)

print("FLIGHT SMOKE OK")
