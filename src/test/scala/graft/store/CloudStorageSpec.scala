package graft.store

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class CloudStorageSpec extends AnyFunSuite with SparkFixture {

  test("env credentials land on the session's fs.s3a.* keys (reference creds-push parity)") {
    val applied = CloudStorage.applyS3FromEnv(spark, Map(
      "AWS_ACCESS_KEY_ID" -> "AKTEST",
      "AWS_SECRET_ACCESS_KEY" -> "sekret",
      "AWS_SESSION_TOKEN" -> "tok",
      "UNRELATED" -> "x"))
    val conf = spark.sparkContext.hadoopConfiguration
    assert(applied === Seq("fs.s3a.access.key", "fs.s3a.secret.key",
      "fs.s3a.session.token"))
    assert(conf.get("fs.s3a.access.key") === "AKTEST")
    assert(conf.get("fs.s3a.secret.key") === "sekret")
    // session token implies the temporary-credentials provider
    assert(conf.get("fs.s3a.aws.credentials.provider")
      .contains("TemporaryAWSCredentialsProvider"))
  }

  test("Serve.configure wires endpoint creds AND scale defaults onto the session (opt-in S3 entry)") {
    // the exact env a MinIO/third-party-S3 run exports (README recipe);
    // one call on the daemon path must land all of it on the Hadoop conf
    // executors inherit — making a real-object-store run a config change
    val applied = graft.ingest.Serve.configure(spark, Map(
      "AWS_ACCESS_KEY_ID" -> "AKENTRY",
      "AWS_SECRET_ACCESS_KEY" -> "entrysecret",
      "AWS_ENDPOINT_URL" -> "http://minio.local:9000",
      "AWS_REGION" -> "us-west-2"))
    val conf = spark.sparkContext.hadoopConfiguration
    assert(applied.contains("fs.s3a.endpoint"))
    assert(conf.get("fs.s3a.endpoint") === "http://minio.local:9000")
    assert(conf.get("fs.s3a.endpoint.region") === "us-west-2")
    assert(conf.get("fs.s3a.access.key") === "AKENTRY")
    // the scale defaults ride along on the same call
    assert(conf.get("fs.s3a.committer.name") === "magic")
  }

  test("scale defaults apply only where unset; operator overrides win") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.s3a.connection.maximum", "500") // operator already tuned this
    CloudStorage.applyS3ScaleDefaults(spark)
    assert(conf.get("fs.s3a.connection.maximum") === "500") // untouched
    assert(conf.get("fs.s3a.committer.name") === "magic")   // filled in
    assert(conf.get("fs.s3a.multipart.size") === "128M")
  }
}
