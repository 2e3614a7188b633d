"""CLI: interpretation & clustering analyses (reference
interpret_features.py, interpret_features_grouped.py, svd.py,
svd_transform.py, cluster_and_viz.py, cluster_and_viz_louvain.py,
cluster_by_pwm.py, query_fimo_for_predictions.py)."""

from __future__ import annotations

import argparse
import glob
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="ExPecto-TPU analysis toolkit")
    sub = p.add_subparsers(dest="cmd", required=True)

    fp = sub.add_parser("interpret-features", help="hierarchical clustering of the 20,020 feature columns")
    fp.add_argument("--inputFile", default="./resources/Xreducedall.2002.npy")
    fp.add_argument("--annoFile", default="./resources/geneanno.csv")
    fp.add_argument("--belugaFeatures", required=True)
    fp.add_argument("--n_clusters", type=int, default=10)
    fp.add_argument("--grouped", action="store_true", help="cluster the 2,002 marks instead (n_clusters default 110)")
    fp.add_argument("--out_dir", default="interpret_features")

    sp = sub.add_parser("svd", help="TF-IDF + TruncatedSVD over replicated per-gene tracks")
    sp.add_argument("replicate_dir", help="dir of per-gene (200,2002) npy files (compute_features --replicate_raw)")
    sp.add_argument("--belugaFeatures", required=True)
    sp.add_argument("--n_components", type=int, default=100)
    sp.add_argument("--transform_out", default=None, help="also write the transformed embedding npy")
    sp.add_argument("--out_dir", default="svd_out")

    cp = sub.add_parser("cluster-viz", help="KMeans/t-SNE or Louvain clustering of an embedding")
    cp.add_argument("embedding_npy")
    cp.add_argument("--method", choices=["kmeans", "louvain"], default="kmeans")
    cp.add_argument("--k", type=int, default=30)
    cp.add_argument("--tsne", action="store_true")
    cp.add_argument("--out_dir", default="cluster_viz")

    wp = sub.add_parser("collect-pwms", help="collect JASPAR+HOCOMOCO motifs for Beluga TF assays")
    wp.add_argument("--belugaFeatures", required=True)
    wp.add_argument("--jaspar_motif_db", default=None)
    wp.add_argument("--hocomoco_jaspar_motif_file", default=None)
    wp.add_argument("--lambert_hgnc", default=None)
    wp.add_argument("--hgnc_mapping", default=None)
    wp.add_argument("--out_dir", default="cluster_by_pwm")

    qp = sub.add_parser("fimo-query", help="FIMO motif query around variants")
    qp.add_argument("--vcf_file", required=True)
    qp.add_argument("--motif_file", required=True)
    qp.add_argument("--hg19_fasta", default="resources/hg19.fa")
    qp.add_argument("--bp_pad", type=int, default=30)
    qp.add_argument("--chunk_size", type=int, default=None)
    qp.add_argument("--chunk_i", type=int, default=None)
    qp.add_argument("-o", dest="out_dir", default="temp_query_fimo_for_predictions")

    args = p.parse_args(argv)

    import numpy as np
    import pandas as pd

    from ..io.tables import load_beluga_features

    os.makedirs(args.out_dir, exist_ok=True)

    if args.cmd == "interpret-features":
        from ..analysis.cluster import (
            hierarchical_feature_clusters,
            hierarchical_mark_clusters,
            feature_clusters_table,
            mark_clusters_table,
            cluster_sizes,
        )
        from ..pipeline.train import chromosome_split

        X = np.load(args.inputFile)
        geneanno = pd.read_csv(args.annoFile)
        trainind, _ = chromosome_split(geneanno)
        X_train = X[trainind]
        features_df = load_beluga_features(args.belugaFeatures)
        if args.grouped:
            n_clusters = args.n_clusters if args.n_clusters != 10 else 110
            clusters = hierarchical_mark_clusters(X_train, n_clusters=n_clusters)
            table = mark_clusters_table(features_df, clusters)
            cluster_sizes(table).to_csv(f"{args.out_dir}/cluster_sizes.tsv", sep="\t")
        else:
            labels = hierarchical_feature_clusters(X_train, n_clusters=args.n_clusters)
            table = feature_clusters_table(features_df, labels.transpose(1, 0))
        table.to_csv(f"{args.out_dir}/all_feature_clusters.tsv", sep="\t")
        cdir = f"{args.out_dir}/clusters"
        os.makedirs(cdir, exist_ok=True)
        for i in sorted(table["cluster"].unique()):
            table[table["cluster"] == i].to_csv(f"{cdir}/cluster_{i}.tsv", sep="\t")
        print(f"wrote {args.out_dir}/all_feature_clusters.tsv")

    elif args.cmd == "svd":
        from ..analysis.cluster import tfidf_transform, tfidf_svd
        from ..utils.keep_mask import get_keep_mask

        npy_files = sorted(glob.glob(f"{args.replicate_dir}/*.npy"))
        if not npy_files:
            print("no npy files found", file=sys.stderr)
            return 2
        # (n_marks, n_genes*200) spatial tracks (reference svd.py:58-75)
        first = np.load(npy_files[0])
        tracks = np.empty((first.shape[1], len(npy_files), first.shape[0]), dtype=np.float32)
        for i, f in enumerate(npy_files):
            tracks[:, i] = np.load(f).T
        tracks = tracks.reshape(tracks.shape[0], -1)
        svd = tfidf_svd(tracks, n_components=args.n_components)
        import joblib

        joblib.dump(svd, f"{args.out_dir}/svd_{args.n_components}.joblib")
        if args.transform_out:
            np.save(args.transform_out, svd.transform(tfidf_transform(tracks)))
        print(f"wrote {args.out_dir}/svd_{args.n_components}.joblib")

    elif args.cmd == "cluster-viz":
        from ..analysis.cluster import kmeans_clusters, louvain_clusters

        X = np.load(args.embedding_npy)
        if args.method == "kmeans":
            if args.tsne:
                labels, emb = kmeans_clusters(X, k=args.k, with_tsne=True)
                np.save(f"{args.out_dir}/tsne_embedding.npy", emb)
            else:
                labels = kmeans_clusters(X, k=args.k)
        else:
            labels = louvain_clusters(X)
        pd.DataFrame({"cluster": labels}).to_csv(f"{args.out_dir}/clusters.tsv", sep="\t")
        print(f"wrote {args.out_dir}/clusters.tsv ({len(set(labels))} clusters)")

    elif args.cmd == "collect-pwms":
        from ..analysis.pwm import collect_cluster_motifs, write_jaspar
        from ..utils.keep_mask import get_keep_mask

        features_df = load_beluga_features(args.belugaFeatures)
        if args.lambert_hgnc and args.hgnc_mapping:
            keep_mask, hgnc_df = get_keep_mask(
                features_df, no_dnase_features=True, no_histone_features=True, no_pol2=True,
                intersect_with_lambert=True,
                lambert_hgnc_path=args.lambert_hgnc, hgnc_mapping_path=args.hgnc_mapping,
                return_hgnc_df=True,
            )
            included = set(hgnc_df[keep_mask]["Assay"].str.upper())
        else:
            tf_mask = features_df["Assay type"] == "TF"
            included = set(features_df[tf_mask]["Assay"].str.upper())
        motifs, found = collect_cluster_motifs(included, args.jaspar_motif_db, args.hocomoco_jaspar_motif_file)
        print(f"Found {len(found)} motifs out of {len(included)} TF assays")
        with open(f"{args.out_dir}/cluster_motifs.jaspar", "w") as f:
            f.write(write_jaspar(motifs))

    elif args.cmd == "fimo-query":
        from ..analysis.fimo import write_fimo_input, run_fimo, filter_fimo_results
        from ..genome.fasta import FastaIndex

        vcf_df = pd.read_csv(
            args.vcf_file, sep="\t", comment="#",
            names=["CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO"],
        )
        if args.chunk_i is not None:
            vcf_df = vcf_df.iloc[args.chunk_i * args.chunk_size : (args.chunk_i + 1) * args.chunk_size]
        genome = FastaIndex(args.hg19_fasta)
        fasta = f"{args.out_dir}/fimo_in.fasta"
        write_fimo_input(vcf_df, genome, fasta, bp_pad=args.bp_pad)
        out_txt = f"{args.out_dir}/fimo_out.txt"
        run_fimo(args.motif_file, fasta, out_txt)
        filtered = filter_fimo_results(out_txt, bp_pad=args.bp_pad)
        filtered.to_csv(f"{args.out_dir}/fimo_filtered.tsv", sep="\t", header=True)
        print(f"wrote {args.out_dir}/fimo_filtered.tsv")

    return 0


if __name__ == "__main__":
    sys.exit(main())
