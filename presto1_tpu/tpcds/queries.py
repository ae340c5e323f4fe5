"""TPC-DS query corpus (adapted).

Shapes follow the official queries (star joins over date_dim/item/
demographics, grouped aggregation, ranking windows); parameters are
adjusted to the generated data's value ranges, and predicates that need
cross-column varchar comparison (e.g. q19's zip-prefix inequality) are
simplified — each adaptation is noted inline.  Correctness is validated
against a pandas oracle over the identical generated data
(tests/test_tpcds.py).
"""

QUERIES = {
    # q3: brand revenue for a manufacturer in November
    3: """
select d_year, i_brand_id, i_brand, sum(ss_ext_sales_price) sum_agg
from store_sales
join date_dim on ss_sold_date_sk = d_date_sk
join item on ss_item_sk = i_item_sk
where i_manufact_id = 5 and d_moy = 11
group by d_year, i_brand_id, i_brand
order by d_year, sum_agg desc, i_brand_id
limit 100
""",
    # q7: average sales metrics for a demographic slice
    7: """
select i_item_id, avg(ss_quantity) agg1, avg(ss_list_price) agg2,
       avg(ss_coupon_amt) agg3, avg(ss_sales_price) agg4
from store_sales
join customer_demographics on ss_cdemo_sk = cd_demo_sk
join date_dim on ss_sold_date_sk = d_date_sk
join item on ss_item_sk = i_item_sk
join promotion on ss_promo_sk = p_promo_sk
where cd_gender = 'M' and cd_marital_status = 'S'
  and cd_education_status = 'College'
  and (p_channel_email = 'N' or p_channel_event = 'N')
  and d_year = 1998
group by i_item_id order by i_item_id limit 100
""",
    # q19: brand revenue by manager/month (zip-prefix inequality dropped)
    19: """
select i_brand_id, i_brand, i_manufact_id, i_manufact,
       sum(ss_ext_sales_price) ext_price
from date_dim
join store_sales on d_date_sk = ss_sold_date_sk
join item on ss_item_sk = i_item_sk
join customer on ss_customer_sk = c_customer_sk
join customer_address on c_current_addr_sk = ca_address_sk
join store on ss_store_sk = s_store_sk
where i_manager_id = 2 and d_moy = 11 and d_year = 1999
group by i_brand_id, i_brand, i_manufact_id, i_manufact
order by ext_price desc, i_brand_id limit 100
""",
    # q42: category revenue for a month
    42: """
select d_year, i_category_id, i_category, sum(ss_ext_sales_price) s
from date_dim
join store_sales on d_date_sk = ss_sold_date_sk
join item on ss_item_sk = i_item_sk
where i_manager_id = 1 and d_moy = 11 and d_year = 1998
group by d_year, i_category_id, i_category
order by s desc, d_year, i_category_id, i_category limit 100
""",
    # q52: brand revenue for a month
    52: """
select d_year, i_brand_id brand_id, i_brand brand,
       sum(ss_ext_sales_price) ext_price
from date_dim
join store_sales on d_date_sk = ss_sold_date_sk
join item on ss_item_sk = i_item_sk
where i_manager_id = 1 and d_moy = 11 and d_year = 1998
group by d_year, i_brand_id, i_brand
order by d_year, ext_price desc, brand_id limit 100
""",
    # q55: brand revenue for a manager/month
    55: """
select i_brand_id brand_id, i_brand brand,
       sum(ss_ext_sales_price) ext_price
from date_dim
join store_sales on d_date_sk = ss_sold_date_sk
join item on ss_item_sk = i_item_sk
where i_manager_id = 3 and d_moy = 12 and d_year = 1998
group by i_brand_id, i_brand
order by ext_price desc, brand_id limit 100
""",
    # q96: store-sales count in a time window for a household profile
    # (store-name equality replaced by a key predicate; names are synthetic)
    96: """
select count(*) cnt
from store_sales
join household_demographics on ss_hdemo_sk = hd_demo_sk
join time_dim on ss_sold_time_sk = t_time_sk
join store on ss_store_sk = s_store_sk
where t_hour = 20 and t_minute >= 30 and hd_dep_count = 5
  and s_store_sk <= 6
""",
    # q98: class revenue ratio via a partitioned window
    98: """
select i_item_id, i_item_desc, i_category, i_class, i_current_price,
       sum(ss_ext_sales_price) itemrevenue,
       sum(ss_ext_sales_price) * 100.0000 /
         sum(sum(ss_ext_sales_price)) over (partition by i_class) revenueratio
from store_sales
join item on ss_item_sk = i_item_sk
join date_dim on ss_sold_date_sk = d_date_sk
where i_category in ('Sports', 'Books', 'Home')
  and d_date between date '1999-02-22' and date '1999-03-24'
group by i_item_id, i_item_desc, i_category, i_class, i_current_price
order by i_category, i_class, i_item_id, i_item_desc, revenueratio
limit 100
""",
    # q26: catalog-sales demographics averages
    26: """
select i_item_id, avg(cs_quantity) agg1, avg(cs_list_price) agg2,
       avg(cs_coupon_amt) agg3, avg(cs_sales_price) agg4
from catalog_sales
join customer_demographics on cs_bill_cdemo_sk = cd_demo_sk
join date_dim on cs_sold_date_sk = d_date_sk
join item on cs_item_sk = i_item_sk
join promotion on cs_promo_sk = p_promo_sk
where cd_gender = 'F' and cd_marital_status = 'W'
  and cd_education_status = 'Primary'
  and (p_channel_email = 'N' or p_channel_event = 'N')
  and d_year = 2000
group by i_item_id order by i_item_id limit 100
""",
    # q12: web-sales class revenue ratio (window)
    12: """
select i_item_id, i_item_desc, i_category, i_class, i_current_price,
       sum(ws_ext_sales_price) itemrevenue,
       sum(ws_ext_sales_price) * 100.0000 /
         sum(sum(ws_ext_sales_price)) over (partition by i_class) revenueratio
from web_sales
join item on ws_item_sk = i_item_sk
join date_dim on ws_sold_date_sk = d_date_sk
where i_category in ('Men', 'Music', 'Women')
  and d_date between date '2000-01-25' and date '2000-02-24'
group by i_item_id, i_item_desc, i_category, i_class, i_current_price
order by i_category, i_class, i_item_id, i_item_desc, revenueratio
limit 100
""",
    # q89: monthly class sales vs yearly average (window over partition)
    89: """
select i_category, i_class, i_brand, s_store_name, s_company_name,
       d_moy, sum(ss_sales_price) sum_sales,
       avg(sum(ss_sales_price)) over (partition by i_category, i_brand,
                                      s_store_name, s_company_name)
         avg_monthly_sales
from item
join store_sales on ss_item_sk = i_item_sk
join date_dim on ss_sold_date_sk = d_date_sk
join store on ss_store_sk = s_store_sk
where d_year = 1999 and i_category in ('Books', 'Electronics', 'Sports')
group by i_category, i_class, i_brand, s_store_name, s_company_name, d_moy
order by sum_sales, s_store_name limit 100
""",
}
