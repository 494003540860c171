package graft.sources

import graft.streaming.BlockIngest
import org.apache.spark.sql.SparkSession

/** S22: bulk lake bootstrap from object storage — the Spark image of the
  * reference's S3 side-channel (borealis-indexer/.dl/mainnet/s5cmd.sh:
  * 10-14 `s5cmd sync s3://<chain-archive>/ .` before indexing).
  *
  * On Spark there is no separate download step: executors read
  * `s3a://bucket/...` directly, so "bootstrap" is just [[BlockIngest
  * .backfill]] pointed at the bucket URI with a session carrying the
  * [[s3aConf]] settings. The settings are plain public hadoop-aws knobs;
  * in this offline sandbox they are exercised against `file:` URIs (the
  * code path is scheme-agnostic) — on a real cluster only the URI
  * changes.
  */
object CloudLake {

  /** The s3a settings a large backfill actually needs (all public
    * hadoop-aws configuration):
    *  - connection/thread pool sized for many concurrent range reads
    *    per executor;
    *  - the magic committer: object stores have no atomic rename, the
    *    default FileOutputCommitter either double-copies (v1) or is
    *    unsafe (v2);
    *  - 128 MB blocks so Spark's split planning matches typical archive
    *    object sizes.
    *
    * Auth matrix (doc-level parity with the reference consumer's
    * six-arm TLS/creds matrix, borealis-consumer/src/main.rs:421-536 —
    * on Spark each arm is a provider-chain config, not code). Layer the
    * chosen arm over this map before building the session:
    *
    *  - anonymous (public archive buckets) — the `anonymous = true`
    *    default below: `AnonymousAWSCredentialsProvider`.
    *  - instance/pod role (the common cluster case) — the
    *    `anonymous = false` default: `IAMInstanceCredentialsProvider`
    *    resolves EC2/EKS metadata credentials, nothing to distribute.
    *  - static keys from a credentials FILE (the reference's
    *    `creds = <path>` arm): leave the provider default and set
    *    `spark.hadoop.fs.s3a.access.key` / `...s3a.secret.key` from the
    *    profile, or point `AWS_SHARED_CREDENTIALS_FILE` at the file and
    *    use `com.amazonaws.auth.profile.ProfileCredentialsProvider`.
    *    Never inline secrets in job args — they land in event logs.
    *  - session token (the reference's token arm): the two keys above
    *    plus `spark.hadoop.fs.s3a.session.token` with
    *    `TemporaryAWSCredentialsProvider`.
    *  - assume-role (cross-account archives):
    *    `spark.hadoop.fs.s3a.aws.credentials.provider` ->
    *    `org.apache.hadoop.fs.s3a.auth.AssumedRoleCredentialProvider`,
    *    `spark.hadoop.fs.s3a.assumed.role.arn` -> role ARN, optionally
    *    `...assumed.role.session.duration`; the base credentials that
    *    perform the STS call come from
    *    `...assumed.role.credentials.provider` (instance role by
    *    default).
    *  - custom endpoint / non-AWS object store (the reference's
    *    TLS-to-custom-server arms): `spark.hadoop.fs.s3a.endpoint` ->
    *    https URL (TLS verification follows the JVM truststore — add
    *    private CAs there, the `rootCert` analog) and
    *    `spark.hadoop.fs.s3a.path.style.access` -> `true` for MinIO-
    *    style stores.
    *
    * @param anonymous public-bucket reads (the chain archives are
    *                  public) skip the credential chain entirely
    */
  def s3aConf(anonymous: Boolean = false): Map[String, String] = Map(
    "spark.hadoop.fs.s3a.aws.credentials.provider" ->
      (if (anonymous) "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
       else "org.apache.hadoop.fs.s3a.auth.IAMInstanceCredentialsProvider"),
    "spark.hadoop.fs.s3a.connection.maximum" -> "96",
    "spark.hadoop.fs.s3a.threads.max" -> "64",
    "spark.hadoop.fs.s3a.fast.upload" -> "true",
    "spark.hadoop.fs.s3a.block.size" -> "134217728",
    "spark.hadoop.fs.s3a.committer.name" -> "magic",
    "spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a" ->
      "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory")

  /** Bulk-load a raw block-document drop (any Hadoop FS scheme — s3a,
    * gs, file) into the entity-table lake. One batch job; resumable
    * streaming tail-up is [[BlockIngest.start]] with the same lake dir.
    */
  def bootstrap(spark: SparkSession, srcUri: String, lakeDir: String): Unit =
    BlockIngest.backfill(spark, srcUri, lakeDir)
}
