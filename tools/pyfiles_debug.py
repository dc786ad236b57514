import sys
from pyspark.sql import SparkSession
spark = SparkSession.builder.getOrCreate()
conf = spark.sparkContext.getConf()
print("PYFILES:", repr(conf.get("spark.submit.pyFiles", "MISSING")))
print("FILES:", repr(conf.get("spark.files", "MISSING")))
print("PATHHEAD:", sys.path[:6])
import glob
from pyspark import SparkFiles
print("ROOT:", SparkFiles.getRootDirectory(), glob.glob(SparkFiles.getRootDirectory()+"/*"))
spark.stop()
