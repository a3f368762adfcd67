import pyarrow.parquet as pq
import ray.data

from fs_crawler_ray.functions.migrate import migrate_graph_dir, split_name

import pandas as pd


def test_split_name():
    out = split_name(pd.Series(["Stewart, John Wallace", "Campbell", "", "Kerr,  Agnes "]))
    assert out["surname"].tolist() == ["Stewart", "Campbell", "", "Kerr"]
    assert out["given_name"].tolist() == ["John Wallace", "", "", "Agnes"]


def test_migrate_graph_dir(tmp_path, ray_session):
    csv_dir = tmp_path / "csv"
    csv_dir.mkdir()
    (csv_dir / "g.vertices.csv").write_text(
        "#external_id,color,name,iteration,lifespan\n"
        "AAAA-001,-1,\"Stewart, John\",0,1894-1983\n"
        "AAAA-002,1,Campbell,1,Living\n"
    )
    (csv_dir / "g.edges.csv").write_text(
        "#source_vertex,destination_vertex,relationship_type,relationship_id\n"
        "AAAA-002,AAAA-001,BiologicalParent,R000-001\n"
    )
    out = migrate_graph_dir(str(csv_dir), "g", str(tmp_path / "out"))
    verts = ray.data.read_parquet(out["vertices"]).take_all()
    assert len(verts) == 2
    by_id = {v["id"]: v for v in verts}
    assert by_id["AAAA-001"]["surname"] == "Stewart"
    assert by_id["AAAA-001"]["given_name"] == "John"
    assert by_id["AAAA-002"]["surname"] == "Campbell"
    assert by_id["AAAA-002"]["given_name"] == ""
    assert by_id["AAAA-001"]["color"] == -1
    edges = ray.data.read_parquet(out["edges"]).take_all()
    assert edges[0]["source"] == "AAAA-002"
    assert edges[0]["type"] == "BiologicalParent"
