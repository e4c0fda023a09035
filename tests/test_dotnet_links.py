"""J3 .NET Uses sub-joins — fixture semantics of the reference's
tests/relationships/test_dotnet.py (samedir / subdir / culture) plus
the implMap name×ext combinations and codeBase href rebase branches
(surfactant/relationships/dotnet_relationship.py:85-194).
"""

from surfactant_spark.operators.linking import (
    dotnet_assemblyref_uses,
    dotnet_codebase_uses,
    dotnet_implmap_uses,
)


def _targets(spark, rows):
    return spark.createDataFrame(rows, "target_id string, install_path string")


def _edges(df):
    return {(r.subj, r.pred, r.obj) for r in df.collect()}


def test_assemblyref_samedir_subdir_culture(spark):
    """The three reference fixtures verbatim: application at
    C:\\application referencing samedirlib (app base), subdirlib
    (name subdir), culturelib (culture dir)."""
    refs = spark.createDataFrame(
        [
            ("application", "C:\\application", "samedirlib", None, None),
            ("application", "C:\\application", "subdirlib", None, None),
            ("application", "C:\\application", "culturelib", "culture", None),
        ],
        "app_id string, install_path string, ref_name string, "
        "ref_culture string, probing_paths array<string>",
    )
    targets = _targets(spark, [
        ("samedirlib", "C:\\samedirlib.dll"),
        ("subdirlib", "C:\\subdirlib\\subdirlib.dll"),
        ("culturelib", "C:\\culture\\culturelib.dll"),
    ])
    assert _edges(dotnet_assemblyref_uses(refs, targets)) == {
        ("application", "Uses", "samedirlib"),
        ("application", "Uses", "subdirlib"),
        ("application", "Uses", "culturelib"),
    }


def test_assemblyref_private_paths_and_name_culture_dir(spark):
    refs = spark.createDataFrame(
        [
            ("app", "C:/prog/app.exe", "PlugLib", None, ["bin", "plugins"]),
            ("app", "C:/prog/app.exe", "LocLib", "fr", ["bin"]),
        ],
        "app_id string, install_path string, ref_name string, "
        "ref_culture string, probing_paths array<string>",
    )
    targets = _targets(spark, [
        ("t1", "C:/prog/bin/PlugLib/PlugLib.dll"),      # base/p/name
        ("t2", "C:/prog/plugins/PlugLib.dll"),          # base/p
        ("t3", "C:/prog/bin/LocLib/fr/LocLib.dll"),     # base/p/name/culture
        ("t4", "C:/prog/LocLib/fr/LocLib.dll"),         # base/name/culture
        ("t5", "C:/prog/LocLib.dll"),                   # culture set: NOT probed
    ])
    assert _edges(dotnet_assemblyref_uses(refs, targets)) == {
        ("app", "Uses", "t1"),
        ("app", "Uses", "t2"),
        ("app", "Uses", "t3"),
        ("app", "Uses", "t4"),
    }


def test_implmap_combinations_and_absolute(spark):
    refs = spark.createDataFrame(
        [
            ("app", "C:/prog/app.exe", "native"),            # no extension
            ("app", "C:/prog/app.exe", "helper.dll"),        # keeps .dll only
            ("app", "C:/prog/app.exe", "C:\\sys\\abs.dll"),  # absolute
        ],
        "app_id string, install_path string, ref_name string",
    )
    targets = _targets(spark, [
        ("dll", "C:/prog/native.dll"),
        ("so", "C:/prog/libnative.so"),
        ("plain", "C:/prog/libnative"),
        ("helper", "C:/PROG/HELPER.DLL"),        # case-insensitive equality
        ("nodouble", "C:/prog/helper.dll.dll"),  # must NOT match (has ext)
        ("abs", "C:/sys/abs.dll"),
        ("other", "C:/elsewhere/native.dll"),    # wrong dir
    ])
    assert _edges(dotnet_implmap_uses(refs, targets)) == {
        ("app", "Uses", "dll"),
        ("app", "Uses", "so"),
        ("app", "Uses", "plain"),
        ("app", "Uses", "helper"),
        ("app", "Uses", "abs"),
    }


def test_codebase_href_rebase_and_url_skip(spark):
    refs = spark.createDataFrame(
        [
            ("app", "C:/prog/app.exe", "shared/Dep.dll"),
            ("app", "C:/prog/app.exe", "https://cdn.example/Dep.dll"),
            ("app", "C:/prog/app.exe", "D:\\central\\Other.dll"),
        ],
        "app_id string, install_path string, codebase_href string",
    )
    targets = _targets(spark, [
        ("dep", "C:\\prog\\shared\\Dep.dll"),
        ("central", "D:/central/Other.dll"),
        ("cdn", "https://cdn.example/Dep.dll"),  # url branch skipped
    ])
    assert _edges(dotnet_codebase_uses(refs, targets)) == {
        ("app", "Uses", "dep"),
        ("app", "Uses", "central"),
    }


def test_metadata_to_edges_end_to_end(spark):
    """parse_pe .NET fields → refs frames → edges: the E2→J3 chain."""
    from surfactant_spark.functions.binmeta import parse_pe
    from surfactant_spark.functions.dotnetmeta import (
        dotnet_assembly_refs,
        dotnet_implmap,
    )
    from tests.test_dotnetmeta import make_dotnet_pe

    pe = make_dotnet_pe(
        assembly=("App", "", (1, 0, 0, 0)),
        refs=[("CoreLib", "", (3, 0, 0, 0))],
        modrefs=["winhelper"],
        implmap=[("do_it", 1)],
    )
    meta = parse_pe(pe)
    install = "C:/apps/App.exe"
    aref_rows = [
        ("App", install, r["Name"], r["Culture"] or None, None)
        for r in dotnet_assembly_refs(meta)
    ]
    imp_rows = [("App", install, r["Name"]) for r in dotnet_implmap(meta)]
    arefs = spark.createDataFrame(
        aref_rows,
        "app_id string, install_path string, ref_name string, "
        "ref_culture string, probing_paths array<string>",
    )
    imps = spark.createDataFrame(
        imp_rows, "app_id string, install_path string, ref_name string"
    )
    targets = _targets(spark, [
        ("corelib", "C:/apps/CoreLib.dll"),
        ("winhelper", "C:/apps/winhelper.dll"),
    ])
    got = _edges(dotnet_assemblyref_uses(arefs, targets)) | _edges(
        dotnet_implmap_uses(imps, targets)
    )
    assert got == {
        ("App", "Uses", "corelib"),
        ("App", "Uses", "winhelper"),
    }
