"""End-to-end bulk CSV crawl (the reference's primary user flow):
validation split, per-row configs, auth, scoped extraction, per-row
formats, link mode, image download + md ref rewrite, output files,
result records and job summary."""

import json
from pathlib import Path

from crawlray.pipelines.bulk import bulk_crawl, bulk_summary
from crawlray.synth import World, WorldConfig

CFG = WorldConfig(n_urls=300, n_hosts=9, auth_every=3)  # hosts 1,4,7 gated


def _csv(tmp_path, world) -> str:
    open_h = world.hosts[2]
    gated = world.hosts[4]
    rows = [
        "url,mode,format,scope_class,scope_id,download_images,link_type,exclude_anchors,auth_enabled,auth_type,basic_auth_username,basic_auth_password",
        f"https://{open_h}/p/0,content,txt,,,false,all,false,,,,",
        f"https://{open_h}/p/11,content,\"md,json\",,,true,all,false,,,,",  # p/11 has image spans
        f"https://{open_h}/p/2,link,txt,,,false,internal,true,,,,",
        f"https://{open_h}/p/3,content,txt,,nope-id,false,all,false,,,,",
        f"https://{gated}/p/0,content,txt,,,false,all,false,,,,",
        f"https://{gated}/p/2,content,txt,,,false,all,false,true,basic,user4,{world.auth_token(gated, 'pw')}",
        "not-a-url,content,txt,,,false,all,false,,,,",
    ]
    p = tmp_path / "seeds.csv"
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_bulk_crawl_end_to_end(tmp_path):
    world = World(CFG)
    out = tmp_path / "bulkout"
    results, rejects = bulk_crawl(_csv(tmp_path, world), str(out), CFG, n_parts=3)
    df = results.to_pandas().sort_values("seed_rank").reset_index(drop=True)

    assert df["status"].tolist() == ["ok", "ok", "ok", "failed", "http_401", "ok"]
    assert df.loc[3, "error_code"] == "ELEMENT_NOT_FOUND"
    assert df.loc[4, "error_code"] == "401"

    # row 0: plain txt file written with rendered text
    files0 = json.loads(df.loc[0, "files"])
    assert files0 == ["docs/000000.txt"]
    assert (out / files0[0]).read_text().strip() != ""

    # row 1: md + json formats, images downloaded and md refs rewritten
    files1 = json.loads(df.loc[1, "files"])
    assert "docs/000001.md" in files1 and "docs/000001.json" in files1
    media1 = [f for f in files1 if f.startswith("media/")]
    assert df.loc[1, "n_images"] == len(media1) > 0
    md = (out / "docs/000001.md").read_text()
    for m in media1:
        assert (out / m).stat().st_size > 0
    assert "](media/" in md                   # local-path rewrite visible
    parsed = json.loads((out / "docs/000001.json").read_text())
    assert parsed["url"].endswith("/p/11") and parsed["spans"]

    # row 2: link mode — internal-only, anchors stripped, txt+json files
    files2 = json.loads(df.loc[2, "files"])
    assert set(files2) == {"links/000002.txt", "links/000002.json"}
    links = json.loads((out / "links/000002.json").read_text())
    assert all(l["is_internal"] for l in links)
    assert all("#" not in l["url"] for l in links)
    assert df.loc[2, "n_links"] == len(links) > 0

    # failed / 401 rows write nothing
    assert json.loads(df.loc[3, "files"]) == []
    assert json.loads(df.loc[4, "files"]) == []
    # authenticated row fetches fine
    assert json.loads(df.loc[5, "files"]) == ["docs/000005.txt"]

    # rejects carry the invalid URL
    assert rejects.to_pandas()["url_raw"].tolist() == ["not-a-url"]

    summary = bulk_summary(results)
    assert summary["by_status"] == {"ok": 4, "failed": 1, "http_401": 1}
    assert summary["total_links"] > 0
    assert summary["total_images"] == df.loc[1, "n_images"]


def test_reference_naming_kernels():
    """writer.py naming semantics: www/dot cleanup, first path segment
    sanitized+truncated, bulk index prefix, hostile chars replaced."""
    from crawlray.pipelines.bulk import (
        extract_domain_and_path,
        generate_filename,
        generate_folder_name,
    )

    assert extract_domain_and_path("https://www.ex.com/a/b?x=1") == ("ex_com", "_a")
    assert extract_domain_and_path("https://h.org/") == ("h_org", "")
    long = "https://h.org/" + "s" * 80
    assert len(extract_domain_and_path(long)[1]) == 50
    assert generate_folder_name("https://www.ex.com/docs", "20260817_1200") == \
        "ex_com_docs_20260817_1200"
    assert generate_folder_name("https://ex.com/a", "20260817_1200", bulk_index=7) == \
        "007_ex_com_a_20260817_1200"
    assert generate_filename("https://ex.com/a*b", "md", "20260817_1200") == \
        "ex_com_a_b_20260817_1200.md"


def test_package_and_preview(tmp_path):
    """S12 analog: zip packaging is byte-deterministic; preview lists
    every output with truncated text (media by size only)."""
    import zipfile

    from crawlray.pipelines.bulk import package_outputs, preview

    world = World(CFG)
    out = tmp_path / "pkgout"
    bulk_crawl(_csv(tmp_path, world), str(out), CFG, n_parts=2)[0].to_pandas()
    z1 = package_outputs(str(out), str(tmp_path / "a.zip"))
    z2 = package_outputs(str(out), str(tmp_path / "b.zip"))
    assert Path(z1).read_bytes() == Path(z2).read_bytes()  # deterministic
    names = zipfile.ZipFile(z1).namelist()
    assert "docs/000000.txt" in names and any(n.startswith("links/") for n in names)
    pv = preview(str(out), max_chars=50)
    by_file = {e["file"]: e for e in pv}
    assert len(by_file["docs/000000.txt"]["preview"]) <= 50
    media = [e for e in pv if e["file"].startswith("media/")]
    assert media and all(e["preview"] is None and e["bytes"] > 0 for e in media)


def test_bulk_crawl_global_auth(tmp_path):
    world = World(CFG)
    gated = world.hosts[1]
    p = tmp_path / "ga.csv"
    p.write_text(f"url\nhttps://{gated}/p/0\n")
    out = tmp_path / "gaout"
    results, _ = bulk_crawl(
        str(p), str(out), CFG,
        global_auth={"auth_method": "cookies",
                     "cookies": f"session={world.auth_token(gated, 'stok')}"},
        n_parts=1,
    )
    df = results.to_pandas()
    assert df["status"].tolist() == ["ok"]
